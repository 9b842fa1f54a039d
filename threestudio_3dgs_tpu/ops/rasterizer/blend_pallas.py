"""Pallas TPU kernels for the tile blend (forward + backward).

Same numerics as `blend_jax.py` (parity-tested), mapped onto the TPU kernel
model with a *blocked pair layout*:

  * pair features are stored (num_blocks, F, 128): pairs ride the lane
    dimension in aligned blocks of 128, so every HBM->VMEM DMA is a whole
    (F, 128) block -- Mosaic requires lane-dim slices aligned to 128, which
    rules out row-sliced (chunk, F) copies;
  * inside a program, pixels ride sublanes: the big arrays are
    (npix = tile_size^2, 128), transmittance scans are triangular MXU
    matmuls in log space (see _cumsum_lane), channel accumulations and the
    backward contractions are MXU dot_generals with f32 accumulation;
  * grid = one program per image tile; a tile's pair range [start, end) maps
    to blocks floor(start/128) .. ceil(end/128); lanes outside the range are
    masked.  Adjacent tiles can share a boundary block, so the backward does
    a masked read-merge-write: lanes before `start` keep the previous tile's
    values (TPU grid programs run sequentially, and every DMA is waited);
  * forward early-terminates its while-loop once every pixel's raw
    transmittance drops below 1e-4; the backward keeps looping to zero-fill
    remaining rows but skips the math via the live flag.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blend_jax import ALPHA_MAX, ALPHA_MIN, T_EPS

BLOCK = 128  # pair-block granularity (lane tile)
WSLOTS = 4  # backward writeback ring depth (in-flight output DMAs)

# Pairs consumed per walk iteration.  The round-4 device trace showed both
# blend kernels walk-bound (~1.1-1.2 us per iteration regardless of math:
# the quadrant-compacted variant with 0.35x elements ran no faster), so
# wider blocks amortize the per-iteration cost; scans chunk at 128 lanes to
# keep MAC linear in width.  Overridable for A/B measurement.
import os as _os

FWD_WIDTH = int(_os.environ.get("THREESTUDIO_TPU_BLEND_FWD_WIDTH", "256"))
BWD_WIDTH = int(_os.environ.get("THREESTUDIO_TPU_BLEND_BWD_WIDTH", "256"))


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _tri_incl(shape):
    """Lower-triangular ones (incl. diagonal): cumsum-along-lanes as ONE MXU
    matmul, x @ L^T with L[i,j] = j <= i -- vs 3*log2(128) VPU ops for the
    Hillis-Steele scan."""
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return (c <= r).astype(jnp.float32)


def _cumsum_lane(x, terms: int = 3):
    # The triangular matmul is the kernel's FLOP hot spot (npix x 128 x 128
    # per block = 16.8 MMAC, ~5x everything else combined).  The triangular
    # matrix is EXACT in bf16 (zeros/ones), so a 3-term bf16 split of x
    # (residual error ~2^-27 relative -- the 2-term split's 2^-18 compounds
    # visibly through the per-block transmittance carry over ~50 blocks)
    # needs 3 MXU passes vs 6 for f32 HIGHEST: 2x faster at f32-class
    # accuracy.  Scan inputs are logs in [-4.6, 0] (no cancellation).
    # terms=2 (error ~2^-18) serves gradient-only scans in the backward,
    # where 1e-3 is the accuracy budget: one less MXU pass each.
    #
    # Widths > 128 scan in 128-lane chunks with an f32 carry between chunks:
    # MAC stays LINEAR in width (a full triangular would be quadratic),
    # which is what makes the wide-block kernels (WIDTH=256, fewer
    # walk-bound iterations) pay off.
    n = x.shape[1]
    if n > 128:
        outs = []
        carry = jnp.zeros((x.shape[0], 1), jnp.float32)
        for i in range(0, n, 128):
            c = _cumsum_lane(x[:, i : i + 128], terms) + carry
            carry = c[:, -1:]
            outs.append(c)
        return jnp.concatenate(outs, axis=1)
    tri = _tri_incl((n, n)).astype(jnp.bfloat16)
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)

    def mm(a):
        return jax.lax.dot_general(
            a,
            tri,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if terms == 2:
        return mm(hi) + mm(mid)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return mm(hi) + (mm(mid) + mm(lo))


def _cumprod_lane(x, terms: int = 3):
    # x = 1 - alpha in [1 - ALPHA_MAX, 1]: log is safe; one MXU matmul + two
    # transcendentals beat the 21-op multiplicative scan
    return jnp.exp(_cumsum_lane(jnp.log(x), terms))


def _monomial_basis(tile_size: int, npix: int):
    """(npix, 8) tile-relative pixel monomials [x^2, y^2, xy, x, y, 1, 0, 0].

    The per-(pixel, gaussian) Gaussian exponent is a quadratic form, i.e. a
    dot of 6 pixel monomials with 6 per-gaussian coefficients -- ONE MXU
    matmul per block instead of ~10 VPU ops on (npix, BLOCK).  Tile-relative
    coordinates (x, y in [0, tile_size)) keep the monomials small so the f32
    matmul loses no precision to cancellation."""
    row = jax.lax.broadcasted_iota(jnp.int32, (npix, 1), 0)
    x = (row % tile_size).astype(jnp.float32)
    y = (row // tile_size).astype(jnp.float32)
    one = jnp.ones((npix, 1), jnp.float32)
    zero = jnp.zeros((npix, 1), jnp.float32)
    return jnp.concatenate([x * x, y * y, x * y, x, y, one, zero, zero], axis=1)


def _coeff_rows(feats, tx0, ty0):
    """Per-gaussian quadratic coefficients in the tile frame: (8, BLOCK) C
    with power = M @ C.  Also returns the (1, BLOCK) helper rows."""
    x = feats[0:1, :] - tx0
    y = feats[1:2, :] - ty0
    ca = feats[2:3, :]
    cb = feats[3:4, :]
    cc = feats[4:5, :]
    opa = feats[5:6, :]
    zero = jnp.zeros_like(x)
    c = jnp.concatenate(
        [
            -0.5 * ca,
            -0.5 * cc,
            -cb,
            ca * x + cb * y,
            cc * y + cb * x,
            -0.5 * (ca * x * x + cc * y * y) - cb * x * y,
            zero,
            zero,
        ],
        axis=0,
    )  # (8, BLOCK)
    return c, x, y, ca, cb, cc, opa


def _power_mxu(basis, coeffs):
    # HIGHEST is load-bearing: the monomial expansion of the quadratic form
    # has terms up to ~ca*mu^2 (hundreds) cancelling to |power| <= ~12, so a
    # 3-pass bf16 dot (2^-16) would leak ~1e-2 absolute into the exponent
    # for small far-from-tile-origin gaussians.  (Mosaic also lowers only
    # DEFAULT/HIGHEST -- measured round 3.)
    return jax.lax.dot_general(
        basis,
        coeffs,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (npix, BLOCK)


def _block_alpha_mxu(power, opa, pmask):
    """opa is pre-masked on the (1, BLOCK) lane row (opa=0 outside the tile's
    pair range), so the range test never touches an (npix, BLOCK) array:
    alpha_raw = 0 for dead lanes fails the ALPHA_MIN test on its own."""
    del pmask
    gauss = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = opa * gauss
    ok = (power <= 0.0) & (alpha_raw >= ALPHA_MIN)
    alpha = jnp.where(ok, jnp.minimum(alpha_raw, ALPHA_MAX), 0.0)
    return alpha, alpha_raw, ok


def _pad8(n: int) -> int:
    """DMAs whose sublane extent is not a multiple of the f32 tile (8) fault
    at runtime on TPU; pad feature/channel dims up front."""
    return (n + 7) // 8 * 8


def _to_blocks(pair_feats: jnp.ndarray, width: int = BLOCK):
    """(P, F) -> (NB, F8, width) with one extra zero block of headroom."""
    p, f = pair_feats.shape
    nb = (p + width - 1) // width + 1
    padded = jnp.pad(pair_feats, ((0, nb * width - p), (0, _pad8(f) - f)))
    return padded.reshape(nb, width, _pad8(f)).transpose(0, 2, 1)


def _from_blocks(blocked: jnp.ndarray, p: int, f: int):
    nb, f8, width = blocked.shape
    return blocked.transpose(0, 2, 1).reshape(nb * width, f8)[:p, :f]


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    ranges_ref,  # SMEM (T+1,) scalar prefetch
    feats_hbm,  # ANY (NB, F, BLOCK)
    out_ref,  # VMEM (1, npix, C1)
    scratch,  # VMEM (F, BLOCK)
    sem,  # DMA sem
    *,
    grid_x: int,
    tile_size: int,
    n_channels: int,
    view_grid_y: int = 0,
    width: int = BLOCK,
):
    npix = tile_size * tile_size
    t = pl.program_id(0)
    start = ranges_ref[t]
    end = ranges_ref[t + 1]
    ty_idx = t // grid_x
    if view_grid_y:
        # batched multi-view: B views stack vertically as tile rows; pixel
        # coordinates stay VIEW-LOCAL so per-pair math is bit-identical to
        # the single-view render (means2d are unshifted)
        ty_idx = jax.lax.rem(ty_idx, view_grid_y)
    tx0 = ((t % grid_x) * tile_size).astype(jnp.float32)
    ty0 = (ty_idx * tile_size).astype(jnp.float32)
    basis = _monomial_basis(tile_size, npix)
    lane = _lane_iota((1, width))

    out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    b0 = start // width
    b1 = pl.cdiv(end, width)

    def rd(b, s):
        return pltpu.make_async_copy(feats_hbm.at[b], scratch.at[s], sem.at[s])

    @pl.when(b0 < b1)
    def _():
        rd(b0, 0).start()

    def cond(carry):
        b, raw = carry
        return jnp.logical_and(b < b1, jnp.max(raw) >= T_EPS)

    def body(carry):
        b, raw = carry
        s = jax.lax.rem(b - b0, 2)

        @pl.when(b + 1 < b1)
        def _():
            rd(b + 1, 1 - s).start()

        rd(b, s).wait()
        feats = scratch[s]
        gid = b * width + lane
        pmask = jnp.logical_and(gid >= start, gid < end)  # (1, BLOCK)
        coeffs, _, _, _, _, _, opa = _coeff_rows(feats, tx0, ty0)
        opa = jnp.where(pmask, opa, 0.0)  # lane-row range mask, see helper
        alpha, _, _ = _block_alpha_mxu(_power_mxu(basis, coeffs), opa, pmask)
        om = 1.0 - alpha
        cum_incl = raw * _cumprod_lane(om)  # (npix, BLOCK)
        include = cum_incl >= T_EPS
        rolled = pltpu.roll(cum_incl, 1, axis=1)
        cum_excl = jnp.where(_lane_iota(cum_incl.shape) >= 1, rolled, raw)
        w = jnp.where(include, alpha * cum_excl, 0.0)
        # [colors; ones] rows: ONE matmul accumulates channels AND the weight
        # sum (alpha map) -- the separate lane-tree sum of w was ~7 extra VPU
        # ops on (npix, BLOCK) (matches the jax twin's colors_ext layout)
        colors_ext = jnp.concatenate(
            [feats[6 : 6 + n_channels, :], jnp.ones((1, width), jnp.float32)],
            axis=0,
        )  # (C+1, width)
        acc = jax.lax.dot_general(
            w,
            colors_ext,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (npix, C+1)
        out_ref[0, :, 0 : n_channels + 1] += acc
        return b + 1, cum_incl[:, width - 1 : width]

    b_final, _ = jax.lax.while_loop(
        cond, body, (b0, jnp.ones((npix, 1), jnp.float32))
    )

    # drain the prefetch issued for the block after the early-exit point
    @pl.when(jnp.logical_and(b_final < b1, b_final > b0))
    def _():
        rd(b_final, jax.lax.rem(b_final - b0, 2)).wait()


def blend_forward_pallas(
    pair_feats: jnp.ndarray,  # (P, F)
    tile_ranges: jnp.ndarray,  # (T+1,)
    grid_x: int,
    grid_y: int,
    tile_size: int,
    n_channels: int,
    interpret: bool = False,
    view_grid_y: int = 0,
    width: int = 0,  # pairs per walk iteration; 0 = module default
) -> jnp.ndarray:
    npix = tile_size * tile_size
    num_tiles = grid_x * grid_y
    n_out = n_channels + 1
    width = width or FWD_WIDTH
    blocked = _to_blocks(pair_feats, width)
    f8 = blocked.shape[1]
    n_out8 = _pad8(n_out)

    kernel = functools.partial(
        _fwd_kernel, grid_x=grid_x, tile_size=tile_size, n_channels=n_channels,
        view_grid_y=view_grid_y, width=width,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, npix, n_out8), lambda t, ranges: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, f8, width), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, npix, n_out8), jnp.float32),
        interpret=interpret,
    )(tile_ranges, blocked)
    return out[..., :n_out]


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(
    ranges_ref,  # SMEM (T+1,)
    feats_hbm,  # ANY (NB, F, BLOCK)
    out_ref,  # VMEM (1, npix, C1) forward output
    g_ref,  # VMEM (1, npix, C1) cotangent
    acc_in_hbm,  # ANY (NB, F, BLOCK) zero-initialized, aliased to the output
    dfeats_hbm,  # ANY out (NB, F, BLOCK)
    scratch,  # VMEM (2, F, BLOCK) double-buffered input blocks
    dscratch,  # VMEM (WSLOTS, F, BLOCK) ring-buffered output blocks
    merge,  # VMEM (F, BLOCK) previous contents of a shared boundary block
    sem_in,  # DMA (2,)
    sem_merge,
    sem_out,  # DMA (WSLOTS,)
    *,
    grid_x: int,
    tile_size: int,
    n_channels: int,
    view_grid_y: int = 0,
    width: int = BLOCK,
):
    """One program per image tile, walking its pair blocks front-to-back.

    The output buffer is zero-initialized OUTSIDE (input_output_alias), so the
    loop early-exits once every pixel saturates (raw transmittance < T_EPS)
    exactly like the forward -- dead and unreached blocks cost nothing.  Input
    reads are double-buffered and output writes ride a WSLOTS-deep ring:
    block b+1's fetch and up to WSLOTS earlier writebacks overlap block b's
    math (~30 VPU ops on (npix, BLOCK))."""
    npix = tile_size * tile_size
    t = pl.program_id(0)
    start = ranges_ref[t]
    end = ranges_ref[t + 1]
    ty_idx = t // grid_x
    if view_grid_y:
        ty_idx = jax.lax.rem(ty_idx, view_grid_y)  # view-local pixel frame
    tx0 = ((t % grid_x) * tile_size).astype(jnp.float32)
    ty0 = (ty_idx * tile_size).astype(jnp.float32)
    basis = _monomial_basis(tile_size, npix)
    lane = _lane_iota((1, width))

    out_full = out_ref[0]  # (npix, C1)
    g_full = g_ref[0]
    u_tot = jnp.sum(g_full * out_full, axis=1, keepdims=True)  # (npix, 1)
    g_colors = g_ref[0, :, 0:n_channels]  # (npix, C)
    g_ext = g_ref[0, :, 0 : n_channels + 1]  # (npix, C+1) [g_colors | g_alpha]

    b0 = start // width
    b1 = pl.cdiv(end, width)

    def rd(b, s):
        return pltpu.make_async_copy(feats_hbm.at[b], scratch.at[s], sem_in.at[s])

    def wr(b, s):
        return pltpu.make_async_copy(dscratch.at[s], dfeats_hbm.at[b], sem_out.at[s])

    @pl.when(b0 < b1)
    def _():
        rd(b0, 0).start()
        # boundary block shared with the previous tile: fetch its rows so the
        # merge below preserves them (programs run sequentially; the previous
        # program waited its writebacks before finishing)
        shares_prev = start % width != 0

        @pl.when(shares_prev)
        def _():
            c = pltpu.make_async_copy(dfeats_hbm.at[b0], merge, sem_merge)
            c.start()
            c.wait()

        @pl.when(jnp.logical_not(shares_prev))
        def _():
            merge[...] = jnp.zeros(merge.shape, merge.dtype)

    def cond(carry):
        b, raw, _ = carry
        return jnp.logical_and(b < b1, jnp.max(raw) >= T_EPS)

    def body(carry):
        b, raw, prefix = carry
        s = jax.lax.rem(b - b0, 2)
        ws = jax.lax.rem(b - b0, WSLOTS)

        @pl.when(b + 1 < b1)
        def _():
            rd(b + 1, 1 - s).start()

        rd(b, s).wait()
        gid = b * width + lane
        feats = scratch[s]
        pmask = jnp.logical_and(gid >= start, gid < end)
        coeffs, x, y, ca, cb, cc, opa = _coeff_rows(feats, tx0, ty0)
        opa = jnp.where(pmask, opa, 0.0)  # lane-row range mask, see helper
        power = _power_mxu(basis, coeffs)
        alpha, alpha_raw, ok = _block_alpha_mxu(power, opa, pmask)
        unclamped = ok & (alpha_raw < ALPHA_MAX)
        om = 1.0 - alpha
        # gradient-only path: 2-term scan splits (err ~2^-18 vs the 1e-3
        # grad budget) -- one less MXU pass per scan than the forward
        cum_incl = raw * _cumprod_lane(om, terms=2)
        include = cum_incl >= T_EPS
        # exclusive transmittance by division: cum_incl = cum_excl * om
        # exactly, om >= 1 - ALPHA_MAX = 0.01 always (alpha clamped), and
        # om_recip is reused by the d_power suffix term -- replaces the
        # roll + lane-iota select (~1ulp numerics delta vs the forward's
        # shifted form, absorbed by the grad budget)
        om_recip = 1.0 / om
        cum_excl = cum_incl * om_recip
        w = jnp.where(include, alpha * cum_excl, 0.0)

        colors_ext = jnp.concatenate(
            [feats[6 : 6 + n_channels, :], jnp.ones((1, width), jnp.float32)],
            axis=0,
        )  # (C+1, width)
        # u_i = <colors_i, g> + g_alpha in ONE matmul via the ones row
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

        # d_power = opa*gauss * d_alpha, consolidated: on live lanes
        # alpha = opa*gauss, so opa*gauss*(u*cum_excl) = u*w = uw (already
        # computed for the prefix scan) and opa*gauss*(suffix/om) =
        # suffix*(alpha*om_recip).
        d_power = jnp.where(
            include & unclamped, uw - suffix * (alpha * om_recip), 0.0
        )
        keep = jnp.where(pmask, 1.0, 0.0)  # (1, BLOCK)
        # every mean/covariance/opacity gradient is a combination of the six
        # d_power pixel moments: ONE MXU matmul replaces five (npix, BLOCK)
        # elementwise products + sublane tree reductions
        mom = jax.lax.dot_general(
            basis,
            d_power,
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (8, BLOCK): rows S_x2|S_y2|S_xy|S_x|S_y|S_1|0|0
        sx2, sy2, sxy = mom[0:1, :], mom[1:2, :], mom[2:3, :]
        sx, sy, s1 = mom[3:4, :], mom[4:5, :], mom[5:6, :]
        dxs = sx - x * s1  # sum d_power * dx  (dx = px - mean_x, tile frame)
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
        )  # (C, BLOCK)
        pad = scratch.shape[1] - 6 - n_channels
        d_all = jnp.concatenate(
            [d_x, d_y, d_ca, d_cb, d_cc, d_opa, d_colors]
            + ([jnp.zeros((pad, width))] if pad else []),
            axis=0,
        ) * keep

        # reuse of dscratch[ws]: the write started WSLOTS iterations ago on
        # this slot must have landed (a deeper ring keeps more writebacks in
        # flight -- with 2 slots the wait landed inside the very next
        # iteration's critical path)
        @pl.when(b - WSLOTS >= b0)
        def _():
            wr(b - WSLOTS, ws).wait()

        dscratch[ws] = d_all + jnp.where(b == b0, merge[...], 0.0)
        wr(b, ws).start()

        return (
            b + 1,
            cum_incl[:, width - 1 : width],
            prefix_inc[:, width - 1 : width],
        )

    b_final, _, _ = jax.lax.while_loop(
        cond,
        body,
        (b0, jnp.ones((npix, 1), jnp.float32), jnp.zeros((npix, 1), jnp.float32)),
    )

    # drain: the read started for b_final (if any) and the last two writes
    @pl.when(jnp.logical_and(b_final < b1, b_final > b0))
    def _():
        rd(b_final, jax.lax.rem(b_final - b0, 2)).wait()

    # (b_final == b0 with b0 < b1 is impossible: raw starts at 1.0 >= T_EPS,
    # so the loop always runs at least once when the tile owns any block --
    # the b0 read is consumed inside the first iteration's wait.)

    for k in range(1, WSLOTS + 1):
        @pl.when(b_final - k >= b0)
        def _(k=k):
            wr(b_final - k, jax.lax.rem(b_final - k - b0, WSLOTS)).wait()


def blend_backward_pallas(
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
    width: int = 0,  # pairs per walk iteration; 0 = module default
) -> jnp.ndarray:
    npix = tile_size * tile_size
    num_tiles = grid_x * grid_y
    n_out = n_channels + 1
    p_total, f_dim = pair_feats.shape
    width = width or BWD_WIDTH
    blocked = _to_blocks(pair_feats, width)
    nb, f8, _ = blocked.shape
    n_out8 = _pad8(n_out)
    out = jnp.pad(out, ((0, 0), (0, 0), (0, n_out8 - n_out)))
    g_out = jnp.pad(g_out, ((0, 0), (0, 0), (0, n_out8 - n_out)))

    kernel = functools.partial(
        _bwd_kernel, grid_x=grid_x, tile_size=tile_size, n_channels=n_channels,
        view_grid_y=view_grid_y, width=width,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, npix, n_out8), lambda t, ranges: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, npix, n_out8), lambda t, ranges: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, f8, width), jnp.float32),
            pltpu.VMEM((WSLOTS, f8, width), jnp.float32),
            pltpu.VMEM((f8, width), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((WSLOTS,)),
        ],
    )
    acc0 = jnp.zeros((nb, f8, width), jnp.float32)
    d_blocked = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, f8, width), jnp.float32),
        input_output_aliases={4: 0},  # acc0 (incl. the prefetch arg) -> out
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_ranges, blocked, out, g_out, acc0)
    d_feats = _from_blocks(d_blocked, p_total, f_dim)
    n_pairs = tile_ranges[-1]
    valid = jnp.arange(p_total, dtype=jnp.int32) < n_pairs
    return jnp.where(valid[:, None], d_feats, 0.0)
