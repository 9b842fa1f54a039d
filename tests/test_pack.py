"""Bit-packing round-trip accuracy for sort payload compression
(ops/rasterizer/pack.py)."""

import numpy as np
import jax.numpy as jnp

from threestudio_3dgs_tpu.ops.rasterizer.pack import (
    pack16,
    pack21,
    unpack16,
    unpack21,
)


def _data(f, p=4097, seed=0):
    rng = np.random.default_rng(seed)
    # wide dynamic range incl. tiny/huge magnitudes, zeros, negatives
    mag = 10.0 ** rng.uniform(-20, 20, size=(p, f))
    sign = rng.choice([-1.0, 1.0], size=(p, f))
    x = (mag * sign).astype(np.float32)
    x[0, :] = 0.0
    x[1, :] = -0.0
    x[2, :] = 1.0
    x[3, :] = -1.0
    return jnp.asarray(x)


def test_pack21_roundtrip_bound():
    for f in (1, 2, 3, 4, 9, 10, 11):
        x = _data(f)
        w = pack21(x)
        assert w.dtype == jnp.uint32
        assert w.shape[1] == (f // 3) * 2 + (0, 1, 2)[f % 3]
        y = unpack21(w, f)
        rel = np.abs(np.asarray(y) - np.asarray(x)) / np.maximum(
            np.abs(np.asarray(x)), 1e-30
        )
        assert rel.max() <= 2.0 ** -13, (f, rel.max())
        # zeros stay exactly zero
        np.testing.assert_array_equal(np.asarray(y[0]), 0.0)


def test_pack16_roundtrip_bound():
    for f in (1, 2, 5, 10):
        x = _data(f)
        w = pack16(x)
        assert w.shape[1] == (f + 1) // 2
        y = unpack16(w, f)
        rel = np.abs(np.asarray(y) - np.asarray(x)) / np.maximum(
            np.abs(np.asarray(x)), 1e-30
        )
        assert rel.max() <= 2.0 ** -8, (f, rel.max())


def test_pack21_word_bit31_unused_in_second_word():
    # w1 uses 31 bits (10 + 21): bit31 must be zero so int32 reinterpretation
    # (if any op casts) cannot flip ordering semantics of payload carriers
    x = _data(3)
    w = pack21(x)
    assert int(jnp.max(w[:, 1] >> 31)) == 0


def test_tpu_reduction_branch_with_packing_matches_portable():
    """The full TPU-side reduction (pack21 sort -> interpret-mode Pallas
    segsum) against the portable prefix-diff branch on identical binning --
    validates the packed path end-to-end without hardware."""
    import jax

    from test_rasterizer import make_scene
    from threestudio_3dgs_tpu.ops.rasterizer import binning as bin_mod
    from threestudio_3dgs_tpu.ops.rasterizer.preprocess import project_gaussians

    means, scales, quats, opacities, colors, cam = make_scene(
        n=400, seed=3, height=64, width=64
    )
    proj = project_gaussians(means, scales, quats, cam, 16)
    b = bin_mod.bin_gaussians(proj, 4, 4, 2**13)
    p = 2**13
    rng = np.random.default_rng(0)
    d_pairs = jnp.asarray(
        rng.normal(size=(p, 10)).astype(np.float32)
        * 10.0 ** rng.uniform(-6, 4, size=(p, 10))
    )
    # production invariant: rows beyond the real-tile region are zero (the
    # blend zero-fills culled/sentinel rows); the two branches only agree
    # under it
    valid = jnp.arange(p) < b.tile_ranges[-1]
    d_pairs = jnp.where(valid[:, None], d_pairs, 0.0)
    got = np.asarray(
        bin_mod._gather_bwd_impl(b, d_pairs, interpret=True)  # TPU branch
    )
    # float64 groupby truth (the portable branch's global prefix-diff is
    # itself f32-noisy on this wide-dynamic-range input)
    n = b.offsets.shape[0]
    gauss = np.asarray(b.pair_gauss)
    dnp = np.asarray(d_pairs, np.float64)
    npairs = int(b.n_pairs)
    ref = np.zeros((n, 10))
    np.add.at(ref, gauss[:npairs], dnp[:npairs])
    abs_sum = np.zeros((n, 10))
    np.add.at(abs_sum, gauss[:npairs], np.abs(dnp[:npairs]))
    # pack21 rounds each TERM to 2^-13 relative, so the reduction error is
    # bounded by 2^-13 * (per-segment sum of |terms|) -- the tight bound
    # under cancellation (plus f32 accumulation noise of the same shape)
    err = np.abs(got - ref)
    bound = (2.0 ** -13 + 2.0 ** -16) * abs_sum + 1e-12
    assert (err <= bound).all(), (err / np.maximum(bound, 1e-30)).max()
    # and zero-input rows stay exactly zero
    assert (got[abs_sum.sum(1) == 0] == 0).all()
    # the exact (unpacked) TPU branch agrees with f64 truth to f32 accuracy
    old = bin_mod.PACK_GRAD_BITS
    bin_mod.PACK_GRAD_BITS = 0
    try:
        got_exact = np.asarray(
            bin_mod._gather_bwd_impl(b, d_pairs, interpret=True)
        )
    finally:
        bin_mod.PACK_GRAD_BITS = old
    assert (np.abs(got_exact - ref) <= 2.0 ** -16 * abs_sum + 1e-12).all()
