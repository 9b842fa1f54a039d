"""Pallas TPU kernel: monotone expand -- map each pair index p to its source
segment (the depth-rank `slot` with offsets[slot] <= p < offsets[slot+1]).

Replaces the scatter-max + cummax construction in binning (~75 ms at 4M pairs
on v5e).  Pairs and offsets are both monotone, so a tile of TILE consecutive
pair positions draws from a window of at most TILE + 1 consecutive offsets
(every visible Gaussian owns >= 1 pair):

      slot[p] = i0 + (# window offsets with index >= i0 and value <= p) - 1

computed as a (TILE x WIN) comparison + row reduction per tile.  The per-tile
starting slots i0 are precomputed OUTSIDE the kernel with a tiny searchsorted
(nt queries, microseconds) and scalar-prefetched, so tiles are independent --
no sequential carry chain.

Valid for p < total pairs (the tail uses sentinel offsets and is masked
downstream, exactly like the XLA fallback)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512  # pairs per grid program (window work is quadratic-ish in TILE;
# with cross-program double-buffered DMA the extra programs are ~free)
WIN = TILE + 256  # offsets window (TILE new segments + alignment slack)
RPF = TILE // 128  # output sublane rows per field (lane dim stays 128)
ORows = (3 * RPF + 7) // 8 * 8  # slot|gauss|tile rows, padded to f32 tile

# exact pre-expansion culling: gaussians whose tile rect has <= MASK_K tiles
# carry a reachable-tile bitmask (computed once in binning); masks stay
# < 2^24 so they survive f32 sort payloads AND the 3-term bf16 one-hot
# select exactly.  MASK_NONE flags "no mask: use area counts + in-expand
# float cull" (big rects).
MASK_K = 24
MASK_NONE = 1 << 24


def f32_divmod(r: jnp.ndarray, w: jnp.ndarray):
    """(q, rem) = divmod(r, w) via f32 reciprocal + ONE correction step —
    TPUs have no integer divide (the jnp int32 // lowering costs ~100 ms at
    2M rows).  Exact for the tiny tile-rect operands used here.  Shared by
    the Pallas kernels and the XLA fallback so pair -> tile assignment is
    identical by construction."""
    q = jnp.floor(r / w)
    rem = r - q * w
    q = jnp.where(rem < 0, q - 1.0, jnp.where(rem >= w, q + 1.0, q))
    rem = r - q * w
    return q, rem


def select_nth_set_bit(m: jnp.ndarray, r: jnp.ndarray):
    """Position of the (r+1)-th set bit of each int32 mask.  Pure jnp vector
    ops -- the pallas kernel and the XLA fallback share it, so pair -> tile
    assignment is identical by construction.  Returns (j, found)."""
    cum = jnp.zeros_like(m)
    jsel = jnp.zeros_like(m)
    target = r.astype(jnp.int32) + 1
    for j in range(MASK_K):
        bit = jax.lax.shift_right_logical(m, j) & 1
        cum = cum + bit
        jsel = jnp.where((bit == 1) & (cum == target), j, jsel)
    return jsel, cum >= target


def _tile_reachable(x0, y0, tile_size, mx, my, ca, cb, cc, opa):
    """Can alpha = opa * exp(-Q/2) reach ALPHA_MIN inside the pixel rect
    [x0, x0+ts-1] x [y0, y0+ts-1]?  Q(d) = ca dx^2 + 2 cb dx dy + cc dy^2.
    Exact continuous max: interior (mean in rect) or on the near vertical /
    horizontal edge, whose 1D argmin is clamped to the segment.  Conservative
    only in pixel discreteness (continuous max >= max over pixel centers),
    so culled pairs are exactly the ones the blend would zero anyway
    (blend_jax.ALPHA_MIN gate).  Pure jnp: used by the Pallas kernel and the
    XLA fallback alike."""
    from .blend_jax import ALPHA_MIN

    x1 = x0 + (tile_size - 1.0)
    y1 = y0 + (tile_size - 1.0)
    dxe = jnp.clip(mx, x0, x1) - mx  # 0 iff mean inside the x-range
    dye = jnp.clip(my, y0, y1) - my
    sa = jnp.maximum(ca, 1e-12)
    sc = jnp.maximum(cc, 1e-12)
    # near vertical edge (dx = dxe fixed): free dy* = -cb dxe / cc, clamped
    dy1 = jnp.clip(-cb * dxe / sc, y0 - my, y1 - my)
    q1 = ca * dxe * dxe + 2.0 * cb * dxe * dy1 + cc * dy1 * dy1
    # near horizontal edge (dy = dye fixed)
    dx2 = jnp.clip(-cb * dye / sa, x0 - mx, x1 - mx)
    q2 = ca * dx2 * dx2 + 2.0 * cb * dx2 * dye + cc * dye * dye
    qmin = jnp.minimum(q1, q2)
    return opa * jnp.exp(-0.5 * qmin) >= ALPHA_MIN


def _kernel(i0_ref, offs_hbm, out_hbm, oscr, sscr, sem_o, sem_w):
    t = pl.program_id(0)
    p0 = t * TILE
    i0 = i0_ref[t]
    w0 = (i0 // 128) * 128  # lane-aligned window start, w0 <= i0 < w0+128
    rd = pltpu.make_async_copy(offs_hbm.at[:, pl.ds(w0, WIN)], oscr, sem_o)
    rd.start()
    rd.wait()
    offs = oscr[0:1, :]  # (1, WIN) int32

    pair_pos = p0 + jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)
    entry_idx = w0 + jax.lax.broadcasted_iota(jnp.int32, (1, WIN), 1)
    le = jnp.logical_and(offs <= pair_pos, entry_idx >= i0)  # (TILE, WIN)
    cnt = jnp.sum(le.astype(jnp.int32), axis=1, keepdims=True)
    slot_col = i0 + cnt - 1  # (TILE, 1)
    sscr[0:RPF, :] = slot_col.reshape(RPF, 128)
    wr = pltpu.make_async_copy(sscr, out_hbm.at[t], sem_w)
    wr.start()
    wr.wait()


def _bin_kernel(
    i0_ref, vals_hbm, out_hbm, vscr, oscr, sem_v, sem_w, *,
    grid_x, tile_size, num_tiles, cull, nt, n_feats=0, mask_row=None,
    view_grid_y=0,
):
    """Fused expand + per-pair tile id (+ exact tile-ellipse culling).

    Beyond the slot expansion above, gathers the per-slot fields
    (offset, gaussian index, tile-rect min x/y, rect width[, mean2d, conic,
    opacity]) from the same VMEM window via a one-hot MXU matmul -- the XLA
    equivalent is five 2M-row random gathers costing ~160 ms on v5e -- and
    computes each pair's covered tile in-register (f32 divmod; rect dims are
    tiny so one correction step makes it exact).

    With `cull`, pairs whose Gaussian cannot reach alpha >= ALPHA_MIN
    anywhere inside the tile are remapped to the sentinel tile (they sort to
    the tail and vanish from every tile range).  The test maximizes
    exp(-Q/2) over the tile rect exactly: the max lies on the near vertical
    or horizontal edge (or the mean is inside), and each edge's 1D quadratic
    argmin is clamped to the edge segment.  Culled pairs contribute exactly
    0 to the blend (forward and backward gate on the same threshold), so
    outputs are bit-identical with ~25-40%% fewer blend pairs."""
    t = pl.program_id(0)
    p0 = t * TILE
    i0 = i0_ref[t]
    w0 = (i0 // 128) * 128  # lane-aligned window start, w0 <= i0 < w0+128
    s = jax.lax.rem(t, 2)

    def rd(tt, ss):
        ww = (i0_ref[tt] // 128) * 128
        return pltpu.make_async_copy(
            vals_hbm.at[:, pl.ds(ww, WIN)], vscr.at[ss], sem_v.at[ss]
        )

    # cross-program double buffering: scratch persists across sequential grid
    # steps, so program t waits on the read program t-1 issued for it and
    # prefetches t+1's window -- the ~3 us DMA latency vanishes from the
    # critical path (it dominated this kernel: 2048 programs x start+wait)
    @pl.when(t == 0)
    def _():
        rd(0, 0).start()

    @pl.when(t + 1 < nt)
    def _():
        rd(t + 1, 1 - s).start()

    rd(t, s).wait()
    offs = vscr[s, 0:1, :]  # (1, WIN) f32 (exact: offsets < 2^24)
    pair_pos = p0 + jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)
    pair_pos_f = pair_pos.astype(jnp.float32)
    entry_idx = w0 + jax.lax.broadcasted_iota(jnp.int32, (1, WIN), 1)
    le = jnp.logical_and(offs <= pair_pos_f, entry_idx >= i0)  # (TILE, WIN)
    # lane-count via ONE bf16 MXU pass (le and the accumulation are exact in
    # bf16 products + f32 accumulate) -- the VPU lane-reduction it replaces
    # was this kernel's hot spot (log2(WIN) full-width roll+add passes)
    ones_col = jnp.ones((WIN, 128), jnp.bfloat16)
    cnt_m = jax.lax.dot_general(
        le.astype(jnp.bfloat16),
        ones_col,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TILE, 128), every column the count
    cnt = cnt_m[:, 0:1].astype(jnp.int32)
    slot_col = i0 + cnt - 1  # (TILE, 1)

    # one-hot select of the per-slot field rows: (F, WIN) @ (WIN, TILE).
    # 3-term bf16 split of the field rows (exact for ints < 2^24, f32-class
    # for the conic/mean fields) -- 3 MXU passes vs 6 for f32 HIGHEST.
    onehot = (entry_idx == slot_col).astype(jnp.bfloat16)  # (TILE, WIN)
    v_f32 = vscr[s]
    v_hi = v_f32.astype(jnp.bfloat16)
    r1 = v_f32 - v_hi.astype(jnp.float32)
    v_mid = r1.astype(jnp.bfloat16)
    v_lo = (r1 - v_mid.astype(jnp.float32)).astype(jnp.bfloat16)

    def sel_mm(a):
        return jax.lax.dot_general(
            a,
            onehot,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    sel = sel_mm(v_hi) + (sel_mm(v_mid) + sel_mm(v_lo))
    # (F, TILE): rows offs|g|tmx|tmy|w[|mx|my|ca|cb|cc|opa]
    pair_row = (
        p0 + jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
    ).astype(jnp.float32)
    r = pair_row - sel[0:1, :]
    g_row = sel[1:2, :]
    tmx, tmy = sel[2:3, :], sel[3:4, :]
    w = jnp.maximum(sel[4:5, :], 1.0)
    q, rem = f32_divmod(r, w)
    tx = tmx + rem
    ty = tmy + q
    tile_row = ty * grid_x + tx

    if cull:
        mx, my = sel[5:6, :], sel[6:7, :]
        ca, cb, cc = sel[7:8, :], sel[8:9, :], sel[9:10, :]
        opa = sel[10:11, :]
        ty_l = ty
        if view_grid_y:
            # batched multi-view: tile rows carry a per-view offset but
            # means2d stay view-local -- test reachability in the view frame
            gy = float(view_grid_y)
            ty_l = ty - jnp.floor(ty / gy) * gy
        keep = _tile_reachable(
            tx * tile_size, ty_l * tile_size, float(tile_size), mx, my, ca, cb, cc, opa
        )
        tile_row = jnp.where(keep, tile_row, float(num_tiles))
    if mask_row is not None:
        # small-rect gaussians carry exact reachable-tile bitmasks: pair r
        # maps to the r-th SET BIT (counts were pre-culled in binning, so no
        # sentinel pairs exist for them); big rects fall through to the
        # divmod + float-cull path above
        m = sel[mask_row : mask_row + 1, :].astype(jnp.int32)
        jsel, found = select_nth_set_bit(m, r.astype(jnp.int32))
        jf = jsel.astype(jnp.float32)
        qm, rm = f32_divmod(jf, w)
        tile_m = (tmy + qm) * grid_x + tmx + rm
        tile_m = jnp.where(found, tile_m, float(num_tiles))
        tile_row = jnp.where(m != MASK_NONE, tile_m, tile_row)

    def wr(tt, ss):
        return pltpu.make_async_copy(oscr.at[ss], out_hbm.at[tt], sem_w.at[ss])

    # this slot's previous write (issued at t-2) must have landed
    @pl.when(t >= 2)
    def _():
        wr(t - 2, s).wait()

    oscr[s, 0:RPF, :] = slot_col.reshape(RPF, 128)
    oscr[s, RPF : 2 * RPF, :] = g_row.astype(jnp.int32).reshape(RPF, 128)
    oscr[s, 2 * RPF : 3 * RPF, :] = tile_row.astype(jnp.int32).reshape(RPF, 128)
    # per-pair blend features (mean2d, conic, opacity, channels), already
    # selected by the same one-hot matmul: emitting them here replaces the
    # (P, F) random row gather in the caller (per-row bound, ~14 ms at 2M
    # pairs -- PERF.md); f32 rows ride the int32 output buffer via bitcast
    for j in range(n_feats):
        fr_i = jax.lax.bitcast_convert_type(sel[5 + j : 6 + j, :], jnp.int32)
        oscr[s, (3 + j) * RPF : (4 + j) * RPF, :] = fr_i.reshape(RPF, 128)
    wr(t, s).start()

    # drain both in-flight writes on the last program
    @pl.when(t == nt - 1)
    def _():
        @pl.when(nt >= 2)
        def _():
            wr(t - 1, 1 - s).wait()

        wr(t, s).wait()


def expand_bin_pallas(
    offsets: jnp.ndarray,  # (N,) int32 exclusive prefix offsets (monotone)
    depth_order: jnp.ndarray,  # (N,) int32 gaussian index per depth rank
    x0_d: jnp.ndarray,  # (N,) int32 rect min x, DEPTH order
    y0_d: jnp.ndarray,  # (N,) int32 rect min y, depth order
    rect_w_d: jnp.ndarray,  # (N,) int32 rect width, depth order
    grid_x: int,
    max_pairs: int,
    tile_size: int = 0,
    num_tiles: int = 0,
    cull_fields_d: jnp.ndarray | None = None,  # (N, 6) mx|my|ca|cb|cc|opa
    chan_fields_d: jnp.ndarray | None = None,  # (N, C) blend channels
    mask_d: jnp.ndarray | None = None,  # (N,) reachable-tile bitmask / MASK_NONE
    interpret: bool = False,
    view_grid_y: int = 0,  # batched multi-view: tile rows per view
) -> tuple[jnp.ndarray, ...]:
    """Fused expansion: returns (slot, gauss_idx, tile_id), each (max_pairs,)
    int32, meaningful for p < total pairs (the tail is masked downstream).
    Rect fields come pre-permuted to depth order (one packed row gather in
    the caller -- per-row-bound TPU gathers make separate ones 4x dearer).
    With `cull_fields_d`, unreachable (gaussian, tile) pairs get tile id
    `num_tiles` (see _tile_reachable).  With `chan_fields_d` (requires cull),
    additionally returns 6 + C per-pair f32 feature columns
    (mx|my|ca|cb|cc|opa|chan_0..chan_{C-1}) selected by the same one-hot
    matmul -- each within ~1 ulp of the exact row (3-term bf16 split)."""
    n = offsets.shape[0]
    assert n < 2**24 and max_pairs < 2**24  # f32-exact one-hot select
    assert num_tiles < 2**24, num_tiles  # tile ids are computed in f32
    assert max_pairs % TILE == 0, max_pairs
    cull = cull_fields_d is not None
    assert chan_fields_d is None or cull, "feature emission requires cull fields"
    n_feats = 0 if chan_fields_d is None else 6 + chan_fields_d.shape[1]
    nt = max_pairs // TILE
    n_pad = ((n + 127) // 128 + (WIN // 128) + 1) * 128

    def pad_f(x, const=0.0):
        return jnp.pad(x.astype(jnp.float32), (0, n_pad - n), constant_values=const)

    # per-slot (depth-order) field rows, padded up to a multiple-of-8 row count
    rows = [
        pad_f(offsets, 2.0**24),  # sentinel keeps `le` false on the tail
        pad_f(depth_order),
        pad_f(x0_d),
        pad_f(y0_d),
        pad_f(rect_w_d),
    ]
    if cull:
        rows += [pad_f(cull_fields_d[:, j]) for j in range(6)]
    if chan_fields_d is not None:
        rows += [pad_f(chan_fields_d[:, j]) for j in range(chan_fields_d.shape[1])]
    mask_row = None
    if mask_d is not None:
        assert cull, "mask path requires cull fields (w row + fallthrough)"
        mask_row = len(rows)
        rows += [pad_f(mask_d, float(MASK_NONE))]
    f_rows = (len(rows) + 7) // 8 * 8
    rows += [jnp.zeros(n_pad, jnp.float32)] * (f_rows - len(rows))
    vals = jnp.stack(rows)  # (F, n_pad)

    tile_starts = jnp.arange(nt, dtype=jnp.int32) * TILE
    i0s = (
        jnp.searchsorted(offsets, tile_starts, side="right").astype(jnp.int32) - 1
    )
    i0s = jnp.clip(i0s, 0, n - 1)

    orows = ((3 + n_feats) * RPF + 7) // 8 * 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, f_rows, WIN), jnp.float32),
            pltpu.VMEM((2, orows, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _bin_kernel,
            grid_x=grid_x,
            tile_size=tile_size,
            num_tiles=num_tiles,
            cull=cull,
            nt=nt,
            n_feats=n_feats,
            mask_row=mask_row,
            view_grid_y=view_grid_y,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, orows, 128), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(i0s, vals)
    slot = out[:, 0:RPF, :].reshape(-1)
    gauss = out[:, RPF : 2 * RPF, :].reshape(-1)
    tile_id = out[:, 2 * RPF : 3 * RPF, :].reshape(-1)
    feat_cols = tuple(
        jax.lax.bitcast_convert_type(
            out[:, (3 + j) * RPF : (4 + j) * RPF, :], jnp.float32
        ).reshape(-1)
        for j in range(n_feats)
    )
    return (slot, gauss, tile_id) + feat_cols


def expand_slots_pallas(
    offsets: jnp.ndarray,  # (N,) int32 exclusive prefix offsets (monotone)
    max_pairs: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns slot (max_pairs,) int32; meaningful for p < total pairs."""
    n = offsets.shape[0]
    assert max_pairs % TILE == 0, max_pairs
    nt = max_pairs // TILE
    n_pad = ((n + 127) // 128 + (WIN // 128) + 1) * 128
    offs_p = jnp.pad(offsets, (0, n_pad - n), constant_values=jnp.int32(2 ** 30))
    offs_2d = jnp.broadcast_to(offs_p.reshape(1, n_pad), (8, n_pad)).astype(
        jnp.int32
    )
    # per-tile starting slots: tiny searchsorted (nt queries into N offsets)
    tile_starts = jnp.arange(nt, dtype=jnp.int32) * TILE
    i0s = (
        jnp.searchsorted(offsets, tile_starts, side="right").astype(jnp.int32) - 1
    )
    i0s = jnp.clip(i0s, 0, n - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((8, WIN), jnp.int32),
            pltpu.VMEM((8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, 8, 128), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(i0s, offs_2d)
    return out[:, 0:RPF, :].reshape(-1)


# ---------------------------------------------------------------------------
# Packed-payload variant (round 4): the depth sort carries 24-bit-packed
# feature words and bit-packed rect ints instead of 15 raw f32 columns
# (TPU sort cost is ~0.55-1 ms per operand at 1-2M rows -- PERF.md trace
# table), and the tile sort downstream carries the packed words unchanged.
# ---------------------------------------------------------------------------


def _bin_kernel_packed(
    i0_ref, vals_hbm, out_hbm, vscr, oscr, sem_v, sem_w, *,
    grid_x, tile_size, num_tiles, nt, pk_words, ch_words, view_grid_y=0,
):
    """Fused expand for the packed window layout:

      row 0 offsets | 1 depth_order | 2 xy (x | y<<8) | 3 wh (w | h<<9) |
      4 mx | 5 my | 6..6+PKW pack24(ca,cb,cc,opa) BITCAST f32 |
      ..+CHW pack24(channels) bitcast | last: reachable-tile mask

    u32 words cannot ride the bf16-split one-hot select (arbitrary bit
    patterns make NaN/Inf under f32 views), so the kernel splits each word
    row into exact 16-bit halves BEFORE the select and recombines after;
    conic/opacity decode in-register for the exact ellipse cull, channel
    words pass through packed -- the blend-side unpack happens in XLA after
    the tile sort."""
    from .pack import unpack24_rows_from_halves

    t = pl.program_id(0)
    p0 = t * TILE
    i0 = i0_ref[t]
    w0 = (i0 // 128) * 128
    s = jax.lax.rem(t, 2)
    nw = pk_words + ch_words

    def rd(tt, ss):
        ww = (i0_ref[tt] // 128) * 128
        return pltpu.make_async_copy(
            vals_hbm.at[:, pl.ds(ww, WIN)], vscr.at[ss], sem_v.at[ss]
        )

    @pl.when(t == 0)
    def _():
        rd(0, 0).start()

    @pl.when(t + 1 < nt)
    def _():
        rd(t + 1, 1 - s).start()

    rd(t, s).wait()
    v = vscr[s]  # (F, WIN) f32
    offs = v[0:1, :]
    pair_pos = p0 + jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)
    pair_pos_f = pair_pos.astype(jnp.float32)
    entry_idx = w0 + jax.lax.broadcasted_iota(jnp.int32, (1, WIN), 1)
    le = jnp.logical_and(offs <= pair_pos_f, entry_idx >= i0)
    ones_col = jnp.ones((WIN, 128), jnp.bfloat16)
    cnt_m = jax.lax.dot_general(
        le.astype(jnp.bfloat16),
        ones_col,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    cnt = cnt_m[:, 0:1].astype(jnp.int32)
    slot_col = i0 + cnt - 1  # (TILE, 1)

    # select input: 6 base rows + mask + 2*nw half rows (all ints < 2^24)
    word_rows = jax.lax.bitcast_convert_type(v[6 : 6 + nw, :], jnp.uint32)
    # Mosaic has no uint32 -> f32 cast; halves fit int32 exactly
    lo_rows = (
        (word_rows & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
    )
    hi_rows = (word_rows >> 16).astype(jnp.int32).astype(jnp.float32)
    mask_r = v[6 + nw : 7 + nw, :]
    sel_in = jnp.concatenate([v[0:6, :], mask_r, lo_rows, hi_rows], axis=0)

    onehot = (entry_idx == slot_col).astype(jnp.bfloat16)  # (TILE, WIN)
    s_hi = sel_in.astype(jnp.bfloat16)
    r1 = sel_in - s_hi.astype(jnp.float32)
    s_mid = r1.astype(jnp.bfloat16)
    s_lo = (r1 - s_mid.astype(jnp.float32)).astype(jnp.bfloat16)

    def sel_mm(a):
        return jax.lax.dot_general(
            a,
            onehot,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    sel = sel_mm(s_hi) + (sel_mm(s_mid) + sel_mm(s_lo))  # (rows, TILE)

    pair_row = (
        p0 + jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
    ).astype(jnp.float32)
    r = pair_row - sel[0:1, :]
    g_row = sel[1:2, :]
    xy = sel[2:3, :].astype(jnp.int32)
    wh = sel[3:4, :].astype(jnp.int32)
    tmx = (xy & 255).astype(jnp.float32)
    tmy = jax.lax.shift_right_logical(xy, 8).astype(jnp.float32)
    w = jnp.maximum((wh & 511).astype(jnp.float32), 1.0)
    q, rem = f32_divmod(r, w)
    tx = tmx + rem
    ty = tmy + q
    tile_row = ty * grid_x + tx

    mx, my = sel[4:5, :], sel[5:6, :]
    m = sel[6:7, :].astype(jnp.int32)
    lo_sel = sel[7 : 7 + nw, :]
    hi_sel = sel[7 + nw : 7 + 2 * nw, :]
    pk_vals = unpack24_rows_from_halves(
        [(lo_sel[j : j + 1, :], hi_sel[j : j + 1, :]) for j in range(pk_words)],
        4,
    )
    ca, cb, cc, opa = pk_vals

    ty_l = ty
    if view_grid_y:
        gy = float(view_grid_y)
        ty_l = ty - jnp.floor(ty / gy) * gy
    keep = _tile_reachable(
        tx * tile_size, ty_l * tile_size, float(tile_size), mx, my, ca, cb, cc, opa
    )
    tile_row = jnp.where(keep, tile_row, float(num_tiles))

    # masked (small-rect) gaussians: pair r maps to the r-th set bit
    jsel, found = select_nth_set_bit(m, r.astype(jnp.int32))
    jf = jsel.astype(jnp.float32)
    qm, rm = f32_divmod(jf, w)
    tile_m = (tmy + qm) * grid_x + tmx + rm
    tile_m = jnp.where(found, tile_m, float(num_tiles))
    tile_row = jnp.where(m != MASK_NONE, tile_m, tile_row)

    def wr(tt, ss):
        return pltpu.make_async_copy(oscr.at[ss], out_hbm.at[tt], sem_w.at[ss])

    @pl.when(t >= 2)
    def _():
        wr(t - 2, s).wait()

    oscr[s, 0:RPF, :] = slot_col.reshape(RPF, 128)
    oscr[s, RPF : 2 * RPF, :] = g_row.astype(jnp.int32).reshape(RPF, 128)
    oscr[s, 2 * RPF : 3 * RPF, :] = tile_row.astype(jnp.int32).reshape(RPF, 128)
    # per-pair outputs: mx, my (f32 bitcast) then the RECOMBINED packed
    # words (u32, no decode -- the tile sort carries them as-is)
    for j, fr in enumerate((mx, my)):
        fr_i = jax.lax.bitcast_convert_type(fr, jnp.int32)
        oscr[s, (3 + j) * RPF : (4 + j) * RPF, :] = fr_i.reshape(RPF, 128)
    for j in range(nw):
        word = lo_sel[j : j + 1, :].astype(jnp.int32) | (
            hi_sel[j : j + 1, :].astype(jnp.int32) << 16
        )
        oscr[s, (5 + j) * RPF : (6 + j) * RPF, :] = word.reshape(RPF, 128)
    wr(t, s).start()

    @pl.when(t == nt - 1)
    def _():
        @pl.when(nt >= 2)
        def _():
            wr(t - 1, 1 - s).wait()

        wr(t, s).wait()


def expand_bin_pallas_packed(
    offsets: jnp.ndarray,  # (N,) int32 exclusive prefix offsets (monotone)
    depth_order: jnp.ndarray,  # (N,) int32
    xy_d: jnp.ndarray,  # (N,) int32 x | y<<8, depth order
    wh_d: jnp.ndarray,  # (N,) int32 w | h<<9, depth order
    mx_d: jnp.ndarray,  # (N,) f32
    my_d: jnp.ndarray,  # (N,) f32
    pk_d: jnp.ndarray,  # (N, PKW) uint32 pack24(ca,cb,cc,opa)
    ch_d: jnp.ndarray,  # (N, CHW) uint32 pack24(channels)
    mask_d: jnp.ndarray,  # (N,) int32 reachable-tile bitmask / MASK_NONE
    grid_x: int,
    max_pairs: int,
    tile_size: int,
    num_tiles: int,
    interpret: bool = False,
    view_grid_y: int = 0,
) -> tuple[jnp.ndarray, ...]:
    """Packed-layout twin of expand_bin_pallas.  Returns
    (slot, gauss, tile_id, mx, my, word_0 .. word_{PKW+CHW-1}) with the
    words still packed (int32)."""
    n = offsets.shape[0]
    assert n < 2**24 and max_pairs < 2**24 and num_tiles < 2**24
    assert max_pairs % TILE == 0, max_pairs
    pkw = pk_d.shape[1]
    chw = ch_d.shape[1]
    nw = pkw + chw
    nt = max_pairs // TILE
    n_pad = ((n + 127) // 128 + (WIN // 128) + 1) * 128

    def pad_f(x, const=0.0):
        return jnp.pad(
            x.astype(jnp.float32), (0, n_pad - n), constant_values=const
        )

    def pad_bits(x):
        return jax.lax.bitcast_convert_type(
            jnp.pad(x.astype(jnp.uint32), (0, n_pad - n)), jnp.float32
        )

    rows = [
        pad_f(offsets, 2.0**24),
        pad_f(depth_order),
        pad_f(xy_d),
        pad_f(wh_d),
        pad_f(mx_d),
        pad_f(my_d),
    ]
    rows += [pad_bits(pk_d[:, j]) for j in range(pkw)]
    rows += [pad_bits(ch_d[:, j]) for j in range(chw)]
    rows += [pad_f(mask_d, float(MASK_NONE))]
    f_rows = (len(rows) + 7) // 8 * 8
    rows += [jnp.zeros(n_pad, jnp.float32)] * (f_rows - len(rows))
    vals = jnp.stack(rows)

    tile_starts = jnp.arange(nt, dtype=jnp.int32) * TILE
    i0s = (
        jnp.searchsorted(offsets, tile_starts, side="right").astype(jnp.int32)
        - 1
    )
    i0s = jnp.clip(i0s, 0, n - 1)

    n_out_rows = 5 + nw  # slot | g | tile | mx | my | words
    orows = (n_out_rows * RPF + 7) // 8 * 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, f_rows, WIN), jnp.float32),
            pltpu.VMEM((2, orows, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _bin_kernel_packed,
            grid_x=grid_x,
            tile_size=tile_size,
            num_tiles=num_tiles,
            nt=nt,
            pk_words=pkw,
            ch_words=chw,
            view_grid_y=view_grid_y,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, orows, 128), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(i0s, vals)
    slot = out[:, 0:RPF, :].reshape(-1)
    gauss = out[:, RPF : 2 * RPF, :].reshape(-1)
    tile_id = out[:, 2 * RPF : 3 * RPF, :].reshape(-1)
    mxy = tuple(
        jax.lax.bitcast_convert_type(
            out[:, (3 + j) * RPF : (4 + j) * RPF, :], jnp.float32
        ).reshape(-1)
        for j in range(2)
    )
    words = tuple(
        out[:, (5 + j) * RPF : (6 + j) * RPF, :].reshape(-1)
        for j in range(nw)
    )
    return (slot, gauss, tile_id) + mxy + words
