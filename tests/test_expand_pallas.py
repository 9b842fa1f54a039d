"""Fused Pallas expand+bin kernel parity vs the XLA scatter-max/cummax path
(interpret mode on CPU; RUN_ON_TPU=1 compiles on hardware).  The kernel
replicates binning.bin_gaussians' fallback branch exactly: per-pair depth-rank
slot, source gaussian index, and covered tile id."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from threestudio_3dgs_tpu.ops.rasterizer.expand_pallas import (
    expand_bin_pallas,
    expand_slots_pallas,
)

INTERPRET = not os.environ.get("RUN_ON_TPU")


def reference_expand_bin(offsets, depth_order, tiles_min, rect_w, grid_x, max_pairs):
    n = offsets.shape[0]
    iota_n = jnp.arange(n, dtype=jnp.int32)
    marks = jnp.zeros(max_pairs, jnp.int32).at[offsets].max(iota_n, mode="drop")
    slot = jax.lax.cummax(marks)
    g = depth_order[slot]
    r = jnp.arange(max_pairs, dtype=jnp.int32) - offsets[slot]
    w = jnp.maximum(rect_w[g], 1)
    q = r // w
    rem = r - q * w
    tx = tiles_min[g, 0] + rem
    ty = tiles_min[g, 1] + q
    return slot, g, ty * grid_x + tx


def random_case(seed, n, grid_x=16, grid_y=16, max_pairs=4096):
    rng = np.random.default_rng(seed)
    # visible gaussians with rects; some invisible (count 0) at the depth tail
    n_vis = int(n * 0.8)
    rw = np.zeros(n, np.int32)
    rh = np.zeros(n, np.int32)
    rw[:n_vis] = rng.integers(1, 5, n_vis)
    rh[:n_vis] = rng.integers(1, 5, n_vis)
    x0 = rng.integers(0, grid_x - 4, n)
    y0 = rng.integers(0, grid_y - 4, n)
    counts = rw * rh
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    assert counts.sum() <= max_pairs
    depth_order = rng.permutation(n).astype(np.int32)
    # tiles_min / rect_w are indexed by ORIGINAL gaussian index
    tiles_min = np.zeros((n, 2), np.int32)
    rect_w_orig = np.zeros(n, np.int32)
    tiles_min[depth_order, 0] = x0[: n]  # assign in depth-rank order
    tiles_min[depth_order, 1] = y0[: n]
    rect_w_orig[depth_order] = rw
    return (
        jnp.asarray(offsets),
        jnp.asarray(depth_order),
        jnp.asarray(tiles_min),
        jnp.asarray(rect_w_orig),
        grid_x,
        max_pairs,
        int(counts.sum()),
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_expand_bin_parity(seed):
    offsets, depth_order, tiles_min, rect_w, grid_x, max_pairs, total = random_case(
        seed, n=500
    )
    slot_k, g_k, tile_k = expand_bin_pallas(
        offsets, depth_order, tiles_min[depth_order, 0], tiles_min[depth_order, 1],
        rect_w[depth_order], grid_x, max_pairs,
        interpret=INTERPRET,
    )
    slot_r, g_r, tile_r = reference_expand_bin(
        offsets, depth_order, tiles_min, rect_w, grid_x, max_pairs
    )
    v = total
    np.testing.assert_array_equal(np.asarray(slot_k[:v]), np.asarray(slot_r[:v]))
    np.testing.assert_array_equal(np.asarray(g_k[:v]), np.asarray(g_r[:v]))
    np.testing.assert_array_equal(np.asarray(tile_k[:v]), np.asarray(tile_r[:v]))


@pytest.mark.parametrize("seed", [0, 3])
def test_expand_bin_feature_emission(seed):
    """With chan_fields_d the kernel returns per-pair feature columns equal
    (to ~1 ulp: 3-term bf16 one-hot split) to gathering the depth-ordered
    field rows at each pair's slot."""
    offsets, depth_order, tiles_min, rect_w, grid_x, max_pairs, total = random_case(
        seed, n=300
    )
    n = offsets.shape[0]
    rng = np.random.default_rng(seed + 100)
    cull = jnp.asarray(
        np.column_stack(
            [
                rng.normal(size=n) * 50 + 100,  # mx
                rng.normal(size=n) * 50 + 100,  # my
                rng.uniform(0.5, 2.0, n),  # ca
                rng.uniform(-0.1, 0.1, n),  # cb
                rng.uniform(0.5, 2.0, n),  # cc
                np.full(n, 0.99),  # opa: keep culling inert for this test
            ]
        ).astype(np.float32)
    )
    chans = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    outs = expand_bin_pallas(
        offsets, depth_order, tiles_min[depth_order, 0], tiles_min[depth_order, 1],
        rect_w[depth_order], grid_x, max_pairs,
        tile_size=16, num_tiles=grid_x * 16,
        cull_fields_d=cull, chan_fields_d=chans,
        interpret=INTERPRET,
    )
    slot_k = np.asarray(outs[0][:total])
    feats = np.stack([np.asarray(c[:total]) for c in outs[3:]], axis=1)
    expected = np.concatenate([np.asarray(cull), np.asarray(chans)], axis=1)[slot_k]
    np.testing.assert_allclose(feats, expected, rtol=2e-7, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 5])
def test_expand_bin_mask_selection(seed):
    """With mask_d, pair r of a masked gaussian maps to its r-th SET BIT
    (row-major rect tile); MASK_NONE rows keep the divmod+cull path."""
    from threestudio_3dgs_tpu.ops.rasterizer.expand_pallas import MASK_NONE

    offsets, depth_order, tiles_min, rect_w, grid_x, max_pairs, total = random_case(
        seed, n=300
    )
    n = offsets.shape[0]
    rng = np.random.default_rng(seed + 7)
    # counts per depth-rank slot (from offsets); build masks in depth order
    counts = np.diff(np.concatenate([np.asarray(offsets), [total]])).astype(int)
    # offsets must stay consistent with popcount, so use identity masks
    # (all `counts[i]` rect bits set); sparse masks are covered by the
    # binning-level rasterizer tests.
    mask = np.zeros(n, np.int64)
    for i in range(n):
        c = counts[i]
        if c > 0 and c <= 24:
            mask[i] = (1 << c) - 1  # first c rect tiles reachable
        else:
            mask[i] = MASK_NONE
    cull = jnp.asarray(
        np.column_stack(
            [np.full(n, 100.0), np.full(n, 100.0), np.full(n, 1.0),
             np.zeros(n), np.full(n, 1.0), np.full(n, 0.99)]
        ).astype(np.float32)
    )
    outs = expand_bin_pallas(
        offsets, depth_order, tiles_min[depth_order, 0], tiles_min[depth_order, 1],
        rect_w[depth_order], grid_x, max_pairs,
        tile_size=16, num_tiles=grid_x * 16,
        cull_fields_d=cull, mask_d=jnp.asarray(mask.astype(np.int32)),
        interpret=INTERPRET,
    )
    slot_k, g_k, tile_k = outs[:3]
    # identity masks (bit r = rect tile r): tile assignment must equal the
    # plain divmod reference wherever the reference stays in-rect
    slot_r, g_r, tile_r = reference_expand_bin(
        offsets, depth_order, tiles_min, rect_w, grid_x, max_pairs
    )
    np.testing.assert_array_equal(np.asarray(slot_k[:total]), np.asarray(slot_r[:total]))
    masked = np.asarray(mask)[np.asarray(slot_k[:total])] != MASK_NONE
    np.testing.assert_array_equal(
        np.asarray(tile_k[:total])[masked], np.asarray(tile_r[:total])[masked]
    )


def test_expand_slots_parity():
    offsets, depth_order, tiles_min, rect_w, grid_x, max_pairs, total = random_case(
        7, n=500
    )
    slot_k = expand_slots_pallas(offsets, max_pairs, interpret=INTERPRET)
    slot_r, _, _ = reference_expand_bin(
        offsets, depth_order, tiles_min, rect_w, grid_x, max_pairs
    )
    np.testing.assert_array_equal(
        np.asarray(slot_k[:total]), np.asarray(slot_r[:total])
    )


def test_expand_bin_packed_parity():
    """The packed-payload expand (round 4: 24-bit feature words + bit-packed
    rect ints riding the depth sort) must reproduce the unpacked kernel's
    slot/gauss/tile outputs exactly and decode features to 2^-16."""
    from threestudio_3dgs_tpu.ops.rasterizer.expand_pallas import (
        MASK_NONE,
        expand_bin_pallas_packed,
    )
    from threestudio_3dgs_tpu.ops.rasterizer.pack import pack24, unpack24

    rng = np.random.default_rng(3)
    n = 700
    grid_x = grid_y = 4
    ts = 16
    max_pairs = 4096
    w = rng.integers(1, 3, size=n).astype(np.int32)
    h = rng.integers(1, 3, size=n).astype(np.int32)
    vis = rng.random(n) > 0.2
    counts = (w * h * vis).astype(np.int32)
    offs = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    order = np.arange(n, dtype=np.int32)
    x0 = rng.integers(0, 3, size=n).astype(np.int32)
    y0 = rng.integers(0, 3, size=n).astype(np.int32)
    mx = rng.uniform(0, 64, n).astype(np.float32)
    my = rng.uniform(0, 64, n).astype(np.float32)
    ca = rng.uniform(0.05, 2.0, n).astype(np.float32)
    cb = rng.uniform(-0.1, 0.1, n).astype(np.float32)
    cc = rng.uniform(0.05, 2.0, n).astype(np.float32)
    opa = rng.uniform(0.1, 0.95, n).astype(np.float32)
    chans = rng.uniform(size=(n, 4)).astype(np.float32)
    mask = np.full(n, MASK_NONE, np.int32)

    # the unpacked kernel with EXACT f32 fields, except conic/opa fed
    # through the same f24 round-trip so the cull decisions agree
    cpk = np.asarray(
        unpack24(pack24(jnp.asarray(np.stack([ca, cb, cc, opa], 1))), 4)
    )
    outs_ref = expand_bin_pallas(
        jnp.asarray(offs), jnp.asarray(order),
        jnp.asarray(x0.astype(np.float32)), jnp.asarray(y0.astype(np.float32)),
        jnp.asarray(w.astype(np.float32)),
        grid_x, max_pairs, tile_size=ts, num_tiles=grid_x * grid_y,
        cull_fields_d=jnp.asarray(
            np.stack([mx, my, cpk[:, 0], cpk[:, 1], cpk[:, 2], cpk[:, 3]], 1)
        ),
        chan_fields_d=jnp.asarray(chans),
        mask_d=jnp.asarray(mask.astype(np.float32)),
        interpret=INTERPRET,
    )
    outs_p = expand_bin_pallas_packed(
        jnp.asarray(offs), jnp.asarray(order),
        jnp.asarray(x0 | y0 << 8),
        jnp.asarray(np.where(counts > 0, w | h << 9, 0).astype(np.int32)),
        jnp.asarray(mx), jnp.asarray(my),
        pack24(jnp.asarray(np.stack([ca, cb, cc, opa], 1))),
        pack24(jnp.asarray(chans)),
        jnp.asarray(mask),
        grid_x, max_pairs, tile_size=ts, num_tiles=grid_x * grid_y,
        interpret=INTERPRET,
    )
    total = int(counts.sum())
    for i, name in enumerate(("slot", "gauss", "tile")):
        np.testing.assert_array_equal(
            np.asarray(outs_ref[i])[:total],
            np.asarray(outs_p[i])[:total],
            err_msg=name,
        )
    np.testing.assert_array_equal(
        np.asarray(outs_ref[3])[:total], np.asarray(outs_p[3])[:total]
    )  # mx exact
    pk_words = jnp.stack([outs_p[5 + j][:total] for j in range(3)], axis=1)
    got = np.asarray(unpack24(pk_words.astype(jnp.uint32), 4))
    ref = np.stack(
        [np.asarray(outs_ref[5 + j])[:total] for j in range(4)], axis=1
    )
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-12)
    assert rel.max() <= 2**-15, rel.max()


def test_bin_gaussians_packed_path_cpu_noop():
    """PACK_FEATS only engages on the TPU pallas path; the CPU fallback must
    keep returning (binning, None) untouched."""
    from threestudio_3dgs_tpu.ops.rasterizer import binning as bin_mod

    assert bin_mod.PACK_FEATS  # default on
