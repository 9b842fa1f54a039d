"""Pallas TPU blend kernels with per-quadrant pair compaction.

The whole-tile kernels (blend_pallas) run every per-(pair, pixel) op on
(npix=1024, 128) blocks -- but most pairs only reach a fraction of their
32x32 tile: alpha >= ALPHA_MIN is achievable in only ~1.4 of the four 16x16
quadrants on the bench scene (scripts/probe_quadrants.py: element ratio
0.35x).  Since the blend zeroes exactly the pairs below ALPHA_MIN (the same
threshold the reachability test uses), each quadrant's blend is EXACTLY the
blend of its reachable subsequence -- compacting pairs per quadrant cuts the
touched (pair, pixel) elements to ~0.35x with bit-equal masks (only fp
reassociation differs, inside the gradient budget).

Mechanism, per tile program:
  * walk the tile's 128-pair blocks as before (double-buffered DMA);
  * per quadrant q, test each pair's reachability of the quadrant rect
    (exact continuous ellipse max, expand_pallas._tile_reachable) on the
    (1, 128) lane row;
  * compact survivors into a per-quadrant STAGING buffer (rows, 256) in VMEM
    scratch via a one-hot MXU matmul (3-term bf16 split, ~1 ulp);
  * when a staging buffer holds >= 128 pairs, PROCESS its left 128 lanes:
    the exact math of the whole-tile kernel on (256, 128) -- one quadrant's
    pixels -- with per-quadrant transmittance/prefix carries in scratch;
  * (backward) per-pair gradients scatter into a QW-block accumulation ring
    (F8, QW*128) via a second one-hot keyed on (src block, src lane) meta
    rows; the ring writes back in input-block order with the same
    boundary-block merge semantics as the whole-tile kernel.  The ring
    advances DETERMINISTICALLY (block b-QW finalizes when block b starts);
    staging buffers still referencing the leaving block are force-processed
    (padded with dead lanes).

All conditional work runs under pl.when with scratch-resident state -- an
earlier functional formulation kept staging buffers in lax.cond-carried
values, which interpret mode executed correctly but Mosaic miscompiled at
scale (conditioned ref mutations inside cond branches); fill counters stay
in the while carry via branch-free arithmetic.

Matches the CUDA backward boundary (reference
renderer/diff_gaussian_rasterizer.py:122-131); numerics mirror
blend_jax exactly up to reassociation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blend_jax import ALPHA_MAX, ALPHA_MIN, T_EPS
from .blend_pallas import (
    BLOCK,
    WSLOTS,
    _coeff_rows,
    _cumsum_lane,
    _lane_iota,
    _monomial_basis,
    _pad8,
    _power_mxu,
    _to_blocks,
    _from_blocks,
)
from .expand_pallas import _tile_reachable

QW = 4  # accumulation ring depth, in input blocks
SWIDTH = 2 * BLOCK  # staging width: fill < 128 before an append of <= 128


def _mm_exact(a, b_bf16):
    """a (f32) @ b (exact-in-bf16 0/1 matrix) via 3-term bf16 split of a:
    ~1 ulp of f32 (the split residual is ~2^-24 relative)."""
    hi = a.astype(jnp.bfloat16)
    r1 = a - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)

    def mm(x):
        return jax.lax.dot_general(
            x,
            b_bf16,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return mm(hi) + (mm(mid) + mm(lo))


def _mm_grad(a, b_bf16):
    """2-term split (err ~2^-18): gradient-path scatters."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def mm(x):
        return jax.lax.dot_general(
            x,
            b_bf16,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return mm(hi) + mm(lo)


def _excl_rank_mm(mask_row):
    """(1, BLOCK) 0/1 -> (1, BLOCK) exclusive running count, as one matmul
    with the strictly-lower-triangular ones matrix (exact in bf16)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
    lt = (r < c).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        mask_row.astype(jnp.bfloat16),
        lt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _append_onehot(mask, n_q):
    """(BLOCK, SWIDTH) bf16 one-hot routing surviving lanes to staging
    positions [n_q, n_q + s); and the survivor count s."""
    mask_f = mask.astype(jnp.float32)
    rank = _excl_rank_mm(mask_f)
    dst = jnp.where(mask, n_q.astype(jnp.float32) + rank, -1.0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, SWIDTH), 1)
    onehot = (dst.astype(jnp.int32).reshape(BLOCK, 1) == cols).astype(
        jnp.bfloat16
    )
    s = jnp.sum(mask_f).astype(jnp.int32)
    return onehot, s


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_quad_kernel(
    ranges_ref,  # SMEM (T+1,)
    feats_hbm,  # ANY (NB, F8, BLOCK)
    outq_ref,  # VMEM (1, 4, QPIX, C1) quadrant-major pixels
    scratch,  # VMEM (2, F8, BLOCK) input double buffer
    sfeats,  # VMEM (4, F8, SWIDTH) staging per quadrant
    qstate,  # VMEM (QPIX, 8): cols 0..3 = per-quadrant transmittance carry
    sem_in,
    *,
    grid_x: int,
    tile_size: int,
    n_channels: int,
    f8: int,
    view_grid_y: int = 0,
):
    half = tile_size // 2
    qpix = half * half
    t = pl.program_id(0)
    start = ranges_ref[t]
    end = ranges_ref[t + 1]
    ty_idx = t // grid_x
    if view_grid_y:
        ty_idx = jax.lax.rem(ty_idx, view_grid_y)
    tx0 = ((t % grid_x) * tile_size).astype(jnp.float32)
    ty0 = (ty_idx * tile_size).astype(jnp.float32)
    basis = _monomial_basis(half, qpix)
    lane = _lane_iota((1, BLOCK))
    lane_s = _lane_iota((1, SWIDTH))
    q_orig = [(tx0 + (q % 2) * half, ty0 + (q // 2) * half) for q in range(4)]

    outq_ref[...] = jnp.zeros(outq_ref.shape, outq_ref.dtype)
    sfeats[...] = jnp.zeros(sfeats.shape, sfeats.dtype)
    qstate[...] = jnp.ones(qstate.shape, qstate.dtype)

    b0 = start // BLOCK
    b1 = pl.cdiv(end, BLOCK)

    def rd(b, s):
        return pltpu.make_async_copy(feats_hbm.at[b], scratch.at[s], sem_in.at[s])

    @pl.when(b0 < b1)
    def _():
        rd(b0, 0).start()

    def process(q, fill):
        """Blend the left 128 staged lanes of quadrant q into the output;
        consume them.  Mutates sfeats / qstate / outq_ref."""
        qx0, qy0 = q_orig[q]
        staged = sfeats[q]
        feats = staged[:, 0:BLOCK]
        valid = lane < jnp.minimum(fill, BLOCK)
        raw = qstate[:, q : q + 1]
        coeffs, _, _, _, _, _, opa = _coeff_rows(feats, qx0, qy0)
        opa = jnp.where(valid, opa, 0.0)
        power = _power_mxu(basis, coeffs)
        gauss = jnp.exp(jnp.minimum(power, 0.0))
        alpha_raw = opa * gauss
        ok = (power <= 0.0) & (alpha_raw >= ALPHA_MIN)
        alpha = jnp.where(ok, jnp.minimum(alpha_raw, ALPHA_MAX), 0.0)
        om = 1.0 - alpha
        cum_incl = raw * jnp.exp(_cumsum_lane(jnp.log(om), terms=3))
        include = cum_incl >= T_EPS
        rolled = pltpu.roll(cum_incl, 1, axis=1)
        cum_excl = jnp.where(_lane_iota(cum_incl.shape) >= 1, rolled, raw)
        w = jnp.where(include, alpha * cum_excl, 0.0)
        colors_ext = jnp.concatenate(
            [feats[6 : 6 + n_channels, :], jnp.ones((1, BLOCK), jnp.float32)],
            axis=0,
        )
        acc = jax.lax.dot_general(
            w,
            colors_ext,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (QPIX, C+1)
        outq_ref[0, q, :, 0 : n_channels + 1] += acc
        qstate[:, q : q + 1] = cum_incl[:, BLOCK - 1 : BLOCK]
        new_n = jnp.maximum(fill - BLOCK, 0)
        rolled_s = pltpu.roll(staged, SWIDTH - BLOCK, axis=1)
        sfeats[q] = jnp.where(lane_s < new_n, rolled_s, 0.0)

    def cond(carry):
        b, _, live = carry
        return jnp.logical_and(b < b1, live)

    def body(carry):
        b, n_qs, _ = carry
        s = jax.lax.rem(b - b0, 2)

        @pl.when(b + 1 < b1)
        def _():
            rd(b + 1, 1 - s).start()

        rd(b, s).wait()
        feats = scratch[s]
        gid = b * BLOCK + lane
        pmask = jnp.logical_and(gid >= start, gid < end)
        mx, my = feats[0:1, :], feats[1:2, :]
        ca, cb, cc = feats[2:3, :], feats[3:4, :], feats[4:5, :]
        opa = feats[5:6, :]

        new_n = []
        for q in range(4):
            qx0, qy0 = q_orig[q]
            live_q = jnp.max(qstate[:, q]) >= T_EPS
            reach = _tile_reachable(
                qx0, qy0, float(half), mx, my, ca, cb, cc, opa
            )
            mask = jnp.logical_and(jnp.logical_and(reach, pmask), live_q)
            onehot, s_q = _append_onehot(mask, n_qs[q])

            @pl.when(s_q > 0)
            def _(q=q, onehot=onehot):
                sfeats[q] += _mm_exact(feats, onehot)

            fill = n_qs[q] + s_q

            @pl.when(fill >= BLOCK)
            def _(q=q, fill=fill):
                process(q, fill)

            new_n.append(fill - jnp.where(fill >= BLOCK, BLOCK, 0))

        live = (
            jnp.max(
                jnp.max(qstate[:, 0:4], axis=1, keepdims=True)
            )
            >= T_EPS
        )
        return b + 1, new_n, live

    b_final, n_qs, _ = jax.lax.while_loop(
        cond, body, (b0, [jnp.int32(0)] * 4, jnp.bool_(True))
    )

    @pl.when(jnp.logical_and(b_final < b1, b_final > b0))
    def _():
        rd(b_final, jax.lax.rem(b_final - b0, 2)).wait()

    # flush staged remainders of live quadrants (< SWIDTH lanes each)
    for _ in range(2):
        new_n = []
        for q in range(4):
            live_q = jnp.max(qstate[:, q]) >= T_EPS
            do = jnp.logical_and(n_qs[q] > 0, live_q)

            @pl.when(do)
            def _(q=q, fill=n_qs[q]):
                process(q, fill)

            new_n.append(
                jnp.where(do, jnp.maximum(n_qs[q] - BLOCK, 0), n_qs[q])
            )
        n_qs = new_n


def blend_forward_quadrant_pallas(
    pair_feats: jnp.ndarray,  # (P, F)
    tile_ranges: jnp.ndarray,  # (T+1,)
    grid_x: int,
    grid_y: int,
    tile_size: int,
    n_channels: int,
    interpret: bool = False,
    view_grid_y: int = 0,
) -> jnp.ndarray:
    """Returns (T, npix, C+1) like blend_forward_pallas (pixel-major); the
    kernel computes quadrant-major and the wrapper restores tile order."""
    assert tile_size % 2 == 0, tile_size
    half = tile_size // 2
    qpix = half * half
    npix = tile_size * tile_size
    num_tiles = grid_x * grid_y
    n_out = n_channels + 1
    blocked = _to_blocks(pair_feats)
    f8 = blocked.shape[1]
    n_out8 = _pad8(n_out)

    kernel = functools.partial(
        _fwd_quad_kernel,
        grid_x=grid_x,
        tile_size=tile_size,
        n_channels=n_channels,
        f8=f8,
        view_grid_y=view_grid_y,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 4, qpix, n_out8),
            lambda t, ranges: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, f8, BLOCK), jnp.float32),
            pltpu.VMEM((4, f8, SWIDTH), jnp.float32),
            pltpu.VMEM((qpix, 8), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_q = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, 4, qpix, n_out8), jnp.float32),
        interpret=interpret,
    )(tile_ranges, blocked)
    # quadrant-major -> pixel-major: (T, qy, qx, yy, xx, C) -> (T, y, x, C)
    out = out_q.reshape(num_tiles, 2, 2, half, half, n_out8)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(num_tiles, npix, n_out8)
    return out[..., :n_out]


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_quad_kernel(
    ranges_ref,  # SMEM (T+1,)
    feats_hbm,  # ANY (NB, F8, BLOCK)
    outq_ref,  # VMEM (1, 4, QPIX, C1) forward output, quadrant-major
    gq_ref,  # VMEM (1, 4, QPIX, C1) cotangent, quadrant-major
    acc_in_hbm,  # ANY (NB, F8, BLOCK) zero-init, aliased to output
    dfeats_hbm,  # ANY out (NB, F8, BLOCK)
    scratch,  # VMEM (2, F8, BLOCK) input double buffer
    sfeats,  # VMEM (4, S8, SWIDTH) staging: F8 features + src_block + src_lane
    qstate,  # VMEM (QPIX, 8): cols 0..3 raw, cols 4..7 prefix
    acc_ring,  # VMEM (F8, QW*BLOCK) gradient accumulation ring
    dscratch,  # VMEM (WSLOTS, F8, BLOCK) writeback DMA staging
    merge,  # VMEM (F8, BLOCK) previous tile's boundary-block contents
    sem_in,
    sem_merge,
    sem_out,  # DMA (WSLOTS,)
    *,
    grid_x: int,
    tile_size: int,
    n_channels: int,
    f8: int,
    view_grid_y: int = 0,
):
    half = tile_size // 2
    qpix = half * half
    t = pl.program_id(0)
    start = ranges_ref[t]
    end = ranges_ref[t + 1]
    ty_idx = t // grid_x
    if view_grid_y:
        ty_idx = jax.lax.rem(ty_idx, view_grid_y)
    tx0 = ((t % grid_x) * tile_size).astype(jnp.float32)
    ty0 = (ty_idx * tile_size).astype(jnp.float32)
    basis = _monomial_basis(half, qpix)
    lane = _lane_iota((1, BLOCK))
    lane_s = _lane_iota((1, SWIDTH))
    lane_r = _lane_iota((1, QW * BLOCK))
    s8 = sfeats.shape[1]
    q_orig = [(tx0 + (q % 2) * half, ty0 + (q // 2) * half) for q in range(4)]

    def q_slices(q):
        out_full = outq_ref[0, q]  # (QPIX, C1)
        g_full = gq_ref[0, q]
        u_tot = jnp.sum(g_full * out_full, axis=1, keepdims=True)
        g_colors = g_full[:, 0:n_channels]
        g_ext = g_full[:, 0 : n_channels + 1]
        return u_tot, g_colors, g_ext

    q_const = [q_slices(q) for q in range(4)]

    sfeats[...] = jnp.zeros(sfeats.shape, sfeats.dtype)
    qstate[...] = jnp.concatenate(
        [jnp.ones((qpix, 4), jnp.float32), jnp.zeros((qpix, 4), jnp.float32)],
        axis=1,
    )
    acc_ring[...] = jnp.zeros(acc_ring.shape, acc_ring.dtype)

    b0 = start // BLOCK
    b1 = pl.cdiv(end, BLOCK)

    def rd(b, s):
        return pltpu.make_async_copy(feats_hbm.at[b], scratch.at[s], sem_in.at[s])

    def wr(b, s):
        return pltpu.make_async_copy(dscratch.at[s], dfeats_hbm.at[b], sem_out.at[s])

    @pl.when(b0 < b1)
    def _():
        rd(b0, 0).start()
        shares_prev = start % BLOCK != 0

        @pl.when(shares_prev)
        def _():
            c = pltpu.make_async_copy(dfeats_hbm.at[b0], merge, sem_merge)
            c.start()
            c.wait()

        @pl.when(jnp.logical_not(shares_prev))
        def _():
            merge[...] = jnp.zeros(merge.shape, merge.dtype)

    def process(q, fill, base):
        """Backward math on the left 128 staged lanes of quadrant q; grads
        scatter into the ring whose lane window starts at block `base`.
        Mutates sfeats / qstate / acc_ring."""
        u_tot, g_colors, g_ext = q_const[q]
        qx0, qy0 = q_orig[q]
        staged = sfeats[q]
        feats = staged[0:f8, 0:BLOCK]
        src_blk = staged[f8 : f8 + 1, 0:BLOCK]  # block id mod 256, f32
        src_lane = staged[f8 + 1 : f8 + 2, 0:BLOCK]
        valid = lane < jnp.minimum(fill, BLOCK)
        raw = qstate[:, q : q + 1]
        prefix = qstate[:, 4 + q : 5 + q]

        coeffs, x, y, ca, cb, cc, opa = _coeff_rows(feats, qx0, qy0)
        opa = jnp.where(valid, opa, 0.0)
        power = _power_mxu(basis, coeffs)
        gauss = jnp.exp(jnp.minimum(power, 0.0))
        alpha_raw = opa * gauss
        ok = (power <= 0.0) & (alpha_raw >= ALPHA_MIN)
        alpha = jnp.where(ok, jnp.minimum(alpha_raw, ALPHA_MAX), 0.0)
        unclamped = ok & (alpha_raw < ALPHA_MAX)
        om = 1.0 - alpha
        cum_incl = raw * jnp.exp(_cumsum_lane(jnp.log(om), terms=2))
        include = cum_incl >= T_EPS
        om_recip = 1.0 / om
        cum_excl = cum_incl * om_recip
        w = jnp.where(include, alpha * cum_excl, 0.0)

        colors_ext = jnp.concatenate(
            [feats[6 : 6 + n_channels, :], jnp.ones((1, BLOCK), jnp.float32)],
            axis=0,
        )
        u = jax.lax.dot_general(
            g_ext,
            colors_ext,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        uw = u * w
        prefix_inc = prefix + _cumsum_lane(uw, terms=2)
        suffix = u_tot - prefix_inc
        d_power = jnp.where(
            include & unclamped, uw - suffix * (alpha * om_recip), 0.0
        )
        keep = jnp.where(valid, 1.0, 0.0)
        mom = jax.lax.dot_general(
            basis,
            d_power,
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        sx2, sy2, sxy = mom[0:1, :], mom[1:2, :], mom[2:3, :]
        sx, sy, s1 = mom[3:4, :], mom[4:5, :], mom[5:6, :]
        dxs = sx - x * s1
        dys = sy - y * s1
        d_x = ca * dxs + cb * dys
        d_y = cc * dys + cb * dxs
        d_ca = -0.5 * (sx2 - 2.0 * x * sx + x * x * s1)
        d_cc = -0.5 * (sy2 - 2.0 * y * sy + y * y * s1)
        d_cb = -(sxy - x * sy - y * sx + x * y * s1)
        d_opa = s1 / jnp.maximum(opa, 1e-12)
        d_colors = jax.lax.dot_general(
            g_colors,
            w,
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        pad = f8 - 6 - n_channels
        d_all = jnp.concatenate(
            [d_x, d_y, d_ca, d_cb, d_cc, d_opa, d_colors]
            + ([jnp.zeros((pad, BLOCK))] if pad else []),
            axis=0,
        ) * keep  # (F8, BLOCK)

        # scatter into the ring: dst = (src_block - base) * 128 + src_lane
        base_mod = (base % 256).astype(jnp.float32)
        rel = src_blk - base_mod
        rel = rel + jnp.where(rel < 0.0, 256.0, 0.0)  # mod-256 wrap
        dst = rel * float(BLOCK) + src_lane
        dst = jnp.where(valid, dst, -1.0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, QW * BLOCK), 1)
        onehot = (dst.astype(jnp.int32).reshape(BLOCK, 1) == cols).astype(
            jnp.bfloat16
        )
        acc_ring[...] += _mm_grad(d_all, onehot)

        qstate[:, q : q + 1] = cum_incl[:, BLOCK - 1 : BLOCK]
        qstate[:, 4 + q : 5 + q] = prefix_inc[:, BLOCK - 1 : BLOCK]
        new_n = jnp.maximum(fill - BLOCK, 0)
        rolled_s = pltpu.roll(staged, SWIDTH - BLOCK, axis=1)
        sfeats[q] = jnp.where(lane_s < new_n, rolled_s, 0.0)

    def ring_out(tail):
        """DMA the ring's oldest block (= input block `tail`) out, merging
        the shared boundary block, and roll the ring forward."""
        ws = jax.lax.rem(tail - b0, WSLOTS)

        @pl.when(tail - WSLOTS >= b0)
        def _():
            wr(tail - WSLOTS, ws).wait()

        dscratch[ws] = acc_ring[:, 0:BLOCK] + jnp.where(
            tail == b0, merge[...], 0.0
        )
        wr(tail, ws).start()
        rolled = pltpu.roll(acc_ring[...], (QW - 1) * BLOCK, axis=1)
        acc_ring[...] = jnp.where(lane_r < (QW - 1) * BLOCK, rolled, 0.0)

    NO_OLD = jnp.int32(2**30)  # sentinel: staging buffer empty

    def cond(carry):
        b, _, _, live = carry
        return jnp.logical_and(b < b1, live)

    def body(carry):
        b, n_qs, olds, _ = carry
        s = jax.lax.rem(b - b0, 2)

        # ---- deterministic ring advance: finalize block tail = b - QW ----
        # olds[q] tracks the oldest source block in staging EXACTLY with
        # branch-free arithmetic: a post-process remainder (fill in
        # (128, 256)) always comes purely from the overflowing append's
        # block (pre-append fill < 128), and a consumed buffer is empty.
        do_adv = b - b0 >= QW
        tail = b - QW
        adv_n, adv_o = [], []
        for q in range(4):
            forced = jnp.logical_and(do_adv, olds[q] <= tail)

            @pl.when(forced)
            def _(q=q, fill=n_qs[q], tail=tail):
                process(q, fill, tail)

            adv_n.append(jnp.where(forced, 0, n_qs[q]))
            adv_o.append(jnp.where(forced, NO_OLD, olds[q]))
        n_qs, olds = adv_n, adv_o

        @pl.when(do_adv)
        def _(tail=tail):
            ring_out(tail)

        base = jnp.maximum(b0, b - QW + 1)

        # ---- input block ------------------------------------------------
        @pl.when(b + 1 < b1)
        def _():
            rd(b + 1, 1 - s).start()

        rd(b, s).wait()
        feats = scratch[s]
        gid = b * BLOCK + lane
        pmask = jnp.logical_and(gid >= start, gid < end)
        mx, my = feats[0:1, :], feats[1:2, :]
        ca, cb, cc = feats[2:3, :], feats[3:4, :], feats[4:5, :]
        opa = feats[5:6, :]

        new_n, new_o = [], []
        for q in range(4):
            qx0, qy0 = q_orig[q]
            live_q = jnp.max(qstate[:, q]) >= T_EPS
            reach = _tile_reachable(
                qx0, qy0, float(half), mx, my, ca, cb, cc, opa
            )
            mask = jnp.logical_and(jnp.logical_and(reach, pmask), live_q)
            onehot, s_q = _append_onehot(mask, n_qs[q])
            meta = jnp.concatenate(
                [
                    jnp.broadcast_to(
                        (b % 256).astype(jnp.float32), (1, BLOCK)
                    ),
                    lane.astype(jnp.float32),
                ]
                + [jnp.zeros((s8 - f8 - 2, BLOCK), jnp.float32)],
                axis=0,
            )
            ext = jnp.concatenate([feats, meta], axis=0)  # (S8, BLOCK)

            @pl.when(s_q > 0)
            def _(q=q, onehot=onehot, ext=ext):
                sfeats[q] += _mm_exact(ext, onehot)

            fill = n_qs[q] + s_q
            old = jnp.where(
                jnp.logical_and(n_qs[q] == 0, s_q > 0), b, olds[q]
            )

            @pl.when(fill >= BLOCK)
            def _(q=q, fill=fill, base=base):
                process(q, fill, base)

            did = fill >= BLOCK
            rem_n = fill - jnp.where(did, BLOCK, 0)
            # post-process remainder came from block b alone; empty -> NO_OLD
            old = jnp.where(
                did, jnp.where(rem_n > 0, b, NO_OLD), old
            )
            new_n.append(rem_n)
            new_o.append(old)

        live = jnp.max(jnp.max(qstate[:, 0:4], axis=1, keepdims=True)) >= T_EPS
        return b + 1, new_n, new_o, live

    b_final, n_qs, _, _ = jax.lax.while_loop(
        cond,
        body,
        (b0, [jnp.int32(0)] * 4, [NO_OLD] * 4, jnp.bool_(True)),
    )

    @pl.when(jnp.logical_and(b_final < b1, b_final > b0))
    def _():
        rd(b_final, jax.lax.rem(b_final - b0, 2)).wait()

    # ---- final flush: live quadrants' staged remainders ------------------
    base_f = jnp.maximum(b0, b_final - QW)
    for _ in range(2):
        new_n = []
        for q in range(4):
            live_q = jnp.max(qstate[:, q]) >= T_EPS
            do = jnp.logical_and(n_qs[q] > 0, live_q)

            @pl.when(do)
            def _(q=q, fill=n_qs[q]):
                process(q, fill, base_f)

            new_n.append(
                jnp.where(do, jnp.maximum(n_qs[q] - BLOCK, 0), n_qs[q])
            )
        n_qs = new_n

    # ---- write back every remaining ring block [base_f, b_final) ---------
    def wb_cond(tl):
        return tl < b_final

    def wb_body(tl):
        ring_out(tl)
        return tl + 1

    jax.lax.while_loop(wb_cond, wb_body, base_f)

    for k in range(1, WSLOTS + 1):
        @pl.when(b_final - k >= b0)
        def _(k=k):
            wr(b_final - k, jax.lax.rem(b_final - k - b0, WSLOTS)).wait()


def blend_backward_quadrant_pallas(
    pair_feats: jnp.ndarray,
    tile_ranges: jnp.ndarray,
    out: jnp.ndarray,  # (T, npix, C1)
    g_out: jnp.ndarray,
    grid_x: int,
    grid_y: int,
    tile_size: int,
    n_channels: int,
    interpret: bool = False,
    view_grid_y: int = 0,
) -> jnp.ndarray:
    assert tile_size % 2 == 0, tile_size
    half = tile_size // 2
    qpix = half * half
    num_tiles = grid_x * grid_y
    n_out = n_channels + 1
    p_total, f_dim = pair_feats.shape
    blocked = _to_blocks(pair_feats)
    nb, f8, _ = blocked.shape
    n_out8 = _pad8(n_out)
    s8 = _pad8(f8 + 2)

    def to_quadrant_major(a):
        a = jnp.pad(a, ((0, 0), (0, 0), (0, n_out8 - a.shape[-1])))
        a = a.reshape(num_tiles, 2, half, 2, half, n_out8)
        #       (T, qy, yy, qx, xx, C) -> (T, qy, qx, yy, xx, C)
        a = a.transpose(0, 1, 3, 2, 4, 5)
        return a.reshape(num_tiles, 4, qpix, n_out8)

    out_q = to_quadrant_major(out)
    g_q = to_quadrant_major(g_out)

    kernel = functools.partial(
        _bwd_quad_kernel,
        grid_x=grid_x,
        tile_size=tile_size,
        n_channels=n_channels,
        f8=f8,
        view_grid_y=view_grid_y,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, 4, qpix, n_out8),
                lambda t, ranges: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 4, qpix, n_out8),
                lambda t, ranges: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, f8, BLOCK), jnp.float32),
            pltpu.VMEM((4, s8, SWIDTH), jnp.float32),
            pltpu.VMEM((qpix, 8), jnp.float32),
            pltpu.VMEM((f8, QW * BLOCK), jnp.float32),
            pltpu.VMEM((WSLOTS, f8, BLOCK), jnp.float32),
            pltpu.VMEM((f8, BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((WSLOTS,)),
        ],
    )
    acc0 = jnp.zeros((nb, f8, BLOCK), jnp.float32)
    d_blocked = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, f8, BLOCK), jnp.float32),
        input_output_aliases={4: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_ranges, blocked, out_q, g_q, acc0)
    d_feats = _from_blocks(d_blocked, p_total, f_dim)
    n_pairs = tile_ranges[-1]
    valid = jnp.arange(p_total, dtype=jnp.int32) < n_pairs
    return jnp.where(valid[:, None], d_feats, 0.0)
