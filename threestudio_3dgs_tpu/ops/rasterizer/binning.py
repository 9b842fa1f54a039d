"""Tile binning: expand (Gaussian x covered-tile) pairs into a static-capacity
table, group by tile with depth order preserved, compute per-tile ranges, and
prepare the index structures that make the gradient reduction scatter-free.

This reproduces the CUDA rasterizer's duplicate-with-keys + radix-sort +
identifyTileRanges pipeline (SURVEY.md section 2.2) with static shapes, tuned
around XLA/TPU's irregular-op costs (measured on v5e):

  1. one global depth argsort of the Gaussians; any subsequence is then
     depth-ordered, so tile grouping only needs a stable single-key sort;
  2. pair -> Gaussian expansion WITHOUT searchsorted (600+ ms at 4M pairs on
     TPU): scatter-max of the Gaussian rank at each pair-offset position,
     then a cummax fill -- ~10x cheaper;
  3. tile grouping via ONE single-key sort of packed (tile << pair_bits | p)
     int32 keys: the payload rides in the low bits, stability is free because
     packed keys are unique and p is depth-ordered;
  4. the sorted low bits ARE the permutation tile-order -> gaussian-major
     order; the backward's per-Gaussian gradient reduction permutes pair
     grads to gaussian-major order with a payload-carrying sort (3x cheaper
     than a random row gather) and reduces contiguous ranges with a Pallas
     monotone segmented sum -- no segment_sum / scatter-add (450+ ms at 4M
     pairs on TPU).

  pairs beyond `max_pairs` capacity are dropped (they are the globally
  deepest Gaussians; `n_dropped` reports it, never silently wrong).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .preprocess import Projected


# Packed depth/tile-sort payloads (round 4): 24-bit feature words + bit-
# packed rect ints; see the packed_ok branch in _bin_impl.  Off -> the
# original full-f32 columns (A/B measurement, or grids > 256 tiles).
import os as _os

PACK_FEATS = _os.environ.get("THREESTUDIO_TPU_PACK_FEATS", "1") != "0"

_warned_unaligned: set = set()


def _warn_unaligned_capacity(max_pairs: int) -> None:
    """A max_pairs that is not a multiple of the expand tile silently falls
    back to the ~10x slower XLA expand + pair gather on TPU; surface it."""
    if max_pairs not in _warned_unaligned:
        _warned_unaligned.add(max_pairs)
        import warnings

        from .expand_pallas import TILE

        warnings.warn(
            f"rasterizer max_pairs={max_pairs} is not a multiple of {TILE}; "
            f"the Pallas expand/fused-feature path is DISABLED on TPU "
            f"(use a multiple of {TILE}, e.g. {(max_pairs // TILE + 1) * TILE})",
            stacklevel=3,
        )


class Binning(NamedTuple):
    pair_gauss: jnp.ndarray  # (P,) int32 original Gaussian index, tile order
    pair_gm: jnp.ndarray  # (P,) int32 tile-order -> gaussian-major pair index
    slot: jnp.ndarray  # (P,) int32 depth-rank (sorted-gaussian) per gm pair
    tile_ranges: jnp.ndarray  # (T + 1,) int32; tile t owns [r[t], r[t+1])
    offsets: jnp.ndarray  # (N,) int32 exclusive pair offsets, depth order
    counts: jnp.ndarray  # (N,) int32 pairs per Gaussian, depth order
    counts_orig: jnp.ndarray  # (N,) int32 pairs per Gaussian, ORIGINAL order
    depth_order: jnp.ndarray  # (N,) int32 Gaussian indices sorted by depth
    n_pairs: jnp.ndarray  # () int32 valid pairs (<= max_pairs)
    n_dropped: jnp.ndarray  # () int32 pairs dropped due to capacity

    @property
    def inv_depth_order(self) -> jnp.ndarray:
        """(N,) rank of each Gaussian: the inverse permutation of
        depth_order, via a 1M-row scatter that the device trace priced at
        ~5.9 ms/step -- computed ON DEMAND because the production TPU
        backward only needs it in the rare capacity-drop branch (the
        lax.cond there executes lazily on TPU)."""
        n = self.depth_order.shape[0]
        iota_n = jnp.arange(n, dtype=jnp.int32)
        return (
            jnp.zeros(n, jnp.int32)
            .at[self.depth_order]
            .set(iota_n, unique_indices=True)
        )


def bin_gaussians(
    proj: Projected,
    grid_x: int,
    grid_y: int,
    max_pairs: int,
    tile_size: int = 0,
    opacities: jnp.ndarray | None = None,
) -> Binning:
    return _bin_impl(proj, grid_x, grid_y, max_pairs, tile_size, opacities, None)[0]


def bin_gaussians_with_feats(
    proj: Projected,
    grid_x: int,
    grid_y: int,
    max_pairs: int,
    tile_size: int,
    opacities: jnp.ndarray,
    channels: jnp.ndarray,  # (N, C) blend channels (colors[, depth][, extras])
    view_grid_y: int = 0,
) -> tuple[Binning, jnp.ndarray | None]:
    """Like bin_gaussians, but on the TPU/Pallas path ALSO returns the
    (P, 6 + C) tile-ordered per-pair feature table
    (mean2d | conic | opacity | channels): the channels ride the depth sort
    as payloads, the fused expand kernel selects all features in-window (the
    one-hot matmul it already runs for culling), and the tile sort carries
    them as payloads -- replacing the per-row-bound (P, F) random gather
    (~14 ms at 2M pairs, PERF.md).  Returns (binning, None) off-TPU; the
    caller falls back to pair_gather.  Values are within ~1 ulp of the exact
    gather (3-term bf16 one-hot split); gradients route through pair_select."""
    return _bin_impl(
        proj, grid_x, grid_y, max_pairs, tile_size, opacities, channels,
        view_grid_y=view_grid_y,
    )


def _bin_impl(
    proj: Projected,
    grid_x: int,
    grid_y: int,
    max_pairs: int,
    tile_size: int = 0,
    opacities: jnp.ndarray | None = None,
    channels: jnp.ndarray | None = None,
    view_grid_y: int = 0,
) -> tuple[Binning, jnp.ndarray | None]:
    """With `opacities` (activated) and `tile_size`, pairs whose Gaussian
    cannot reach alpha >= ALPHA_MIN anywhere inside the covered tile are
    culled (sorted to the sentinel tail) -- the blend would zero them anyway
    (same threshold), so outputs are bit-identical with fewer blend pairs."""
    n = proj.depths.shape[0]
    num_tiles = grid_x * grid_y
    cull = opacities is not None and tile_size > 0
    from .expand_pallas import TILE as _EXPAND_TILE

    use_pallas = jax.default_backend() == "tpu" and max_pairs % _EXPAND_TILE == 0
    if jax.default_backend() == "tpu" and not use_pallas:
        _warn_unaligned_capacity(max_pairs)
    emit_feats = channels is not None and cull and use_pallas
    n_chan = channels.shape[1] if emit_feats else 0

    pair_bits = max(int(max_pairs - 1).bit_length(), 1)
    tile_bits = int(num_tiles).bit_length()
    # (tile, pair) fits one int32 -> packed single-key sort; otherwise a
    # lexicographic 2-key sort (only ~1.3x slower on TPU, measured)
    packed = pair_bits + tile_bits <= 31

    # ---- global depth sort (invisible last) ------------------------------
    # ONE payload-carrying sort replaces argsort + (N, 4-10)-row gather:
    # TPU sort payloads cost ~1 ms/column while a random row gather is
    # per-row bound (~7 ms/M rows) -- see PERF.md cost table
    iota_n = jnp.arange(n, dtype=jnp.int32)

    rect_w = (proj.tiles_max[:, 0] - proj.tiles_min[:, 0]).astype(jnp.int32)
    rect_h = (proj.tiles_max[:, 1] - proj.tiles_min[:, 1]).astype(jnp.int32)
    counts_all = jnp.where(proj.visible, rect_w * rect_h, 0).astype(jnp.int32)

    # ---- exact pre-expansion culling (cull path) --------------------------
    # The exact tile-ellipse test used to run per PAIR inside the expand
    # kernel, remapping unreachable pairs to the sentinel tile -- but those
    # pairs (25-40% of the rect total) still occupied capacity and rode every
    # pair-stage sort.  Here the same test runs per (gaussian, rect tile)
    # BEFORE counting, for gaussians whose rect has <= MASK_K tiles: counts
    # become exact and the reachable set is encoded as a bitmask (< 2^24, so
    # it rides f32 sort payloads exactly).  The expand step then SELECTS the
    # r-th set bit instead of re-testing, so pallas and fallback agree by
    # construction.  Bigger rects (rare) keep area counts + in-expand cull.
    mask_col = None
    if cull:
        from .expand_pallas import MASK_K, MASK_NONE

        sg_op = jax.lax.stop_gradient(opacities)
        from .expand_pallas import f32_divmod

        jj = jnp.arange(MASK_K, dtype=jnp.float32)[None, :]  # (1, K)
        w_f = jnp.maximum(rect_w, 1).astype(jnp.float32)[:, None]
        qj, remj = f32_divmod(jj, w_f)
        tx = proj.tiles_min[:, 0:1].astype(jnp.float32) + remj
        ty = proj.tiles_min[:, 1:2].astype(jnp.float32) + qj
        ty_l = ty if not view_grid_y else ty % float(view_grid_y)
        from .expand_pallas import _tile_reachable

        reach = _tile_reachable(
            tx * tile_size,
            ty_l * tile_size,
            float(tile_size),
            proj.means2d[:, 0:1],
            proj.means2d[:, 1:2],
            proj.conics[:, 0:1],
            proj.conics[:, 1:2],
            proj.conics[:, 2:3],
            sg_op[:, None],
        )
        reach = reach & (jj < counts_all.astype(jnp.float32)[:, None])
        cnt_exact = jnp.sum(reach, axis=1).astype(jnp.int32)
        mask = jnp.sum(
            jnp.where(reach, jnp.int32(1) << jnp.arange(MASK_K, dtype=jnp.int32), 0),
            axis=1,
        ).astype(jnp.int32)
        small = proj.visible & (counts_all <= MASK_K)
        counts_all = jnp.where(small, cnt_exact, counts_all)
        mask_col = jnp.where(small, mask, jnp.int32(MASK_NONE))

    # fully-culled gaussians (count 0) must sort to the inf tail: the expand
    # window bound assumes every in-prefix segment owns >= 1 pair
    sort_depth = jnp.where(counts_all > 0, proj.depths, jnp.inf)

    # ---- packed-payload fast path (round 4) -------------------------------
    # TPU sort cost is per OPERAND (~0.55-1 ms at 1-2M rows); the production
    # depth sort carried 15 payload columns and the tile sort 11.  Here the
    # rect ints bit-pack (x|y<<8, w|h<<9), conic+opacity and the channels
    # ride as 24-bit packed words (4 values -> 3 words, rel err 2^-16 --
    # inside the 85 dB oracle floor; means2d stay exact f32), and the counts
    # column is RECONSTRUCTED post-sort (popcount(mask) for exact-culled
    # small rects, w*h otherwise).  Depth sort: 17 -> 13 operands; tile
    # sort: 12 -> 10.
    packed_ok = (
        PACK_FEATS
        and emit_feats
        and mask_col is not None
        and grid_x <= 256
        and grid_y <= 256
    )
    if packed_ok:
        from .expand_pallas import MASK_NONE as _MASK_NONE
        from .expand_pallas import expand_bin_pallas_packed
        from .pack import pack24, unpack24

        chan_sg = jax.lax.stop_gradient(channels)
        sg_op = jax.lax.stop_gradient(opacities)
        xy_col = proj.tiles_min[:, 0].astype(jnp.int32) | (
            proj.tiles_min[:, 1].astype(jnp.int32) << 8
        )
        wh_col = jnp.where(
            counts_all > 0,
            rect_w | (rect_h << 9),
            0,
        ).astype(jnp.int32)
        pk = pack24(
            jnp.stack(
                [
                    proj.conics[:, 0],
                    proj.conics[:, 1],
                    proj.conics[:, 2],
                    sg_op,
                ],
                axis=1,
            )
        )  # (N, 3) uint32
        ch = pack24(chan_sg)  # (N, CHW)
        chw = ch.shape[1]
        sorted_ops = jax.lax.sort(
            (
                sort_depth,
                iota_n,
                xy_col,
                wh_col,
                proj.means2d[:, 0],
                proj.means2d[:, 1],
            )
            + tuple(pk[:, j] for j in range(pk.shape[1]))
            + tuple(ch[:, j] for j in range(chw))
            + (mask_col,),
            num_keys=1,
        )
        depth_order = sorted_ops[1]
        xy_s, wh_s = sorted_ops[2], sorted_ops[3]
        mx_s, my_s = sorted_ops[4], sorted_ops[5]
        pk_s = sorted_ops[6 : 6 + pk.shape[1]]
        ch_s = sorted_ops[6 + pk.shape[1] : 6 + pk.shape[1] + chw]
        mask_s = sorted_ops[-1]
        counts = jnp.where(
            mask_s != jnp.int32(_MASK_NONE),
            jax.lax.population_count(mask_s),
            (wh_s & 511) * jax.lax.shift_right_logical(wh_s, 9),
        ).astype(jnp.int32)
        _SAT = float(2**24)
        cs = jnp.cumsum(counts.astype(jnp.float32))
        offsets = jnp.concatenate([jnp.zeros(1, jnp.float32), cs[:-1]])
        offsets = jnp.minimum(offsets, _SAT).astype(jnp.int32)
        total_f = jnp.minimum(cs[-1], _SAT)
        n_pairs = jnp.minimum(total_f, float(max_pairs)).astype(jnp.int32)
        n_dropped = (total_f - n_pairs).astype(jnp.int32)

        outs = expand_bin_pallas_packed(
            offsets,
            depth_order,
            xy_s,
            wh_s,
            mx_s,
            my_s,
            jnp.stack(pk_s, axis=1),
            jnp.stack(ch_s, axis=1),
            mask_s,
            grid_x,
            max_pairs,
            tile_size=tile_size,
            num_tiles=num_tiles,
            view_grid_y=view_grid_y,
        )
        slot, g, tile_id = outs[:3]
        pair_feat_cols = outs[3:]  # mx, my, packed words
        p = jnp.arange(max_pairs, dtype=jnp.int32)
        valid = p < n_pairs
        safe_tile = jnp.where(valid, tile_id, num_tiles)
        assert packed, "packed tile key requires pair_bits+tile_bits <= 31"
        key = safe_tile << pair_bits | p
        sorted_ops2 = jax.lax.sort((key, g) + pair_feat_cols, num_keys=1)
        sorted_key, pair_gauss = sorted_ops2[0], sorted_ops2[1]
        pair_gm = sorted_key & ((1 << pair_bits) - 1)
        boundaries = jnp.arange(num_tiles + 1, dtype=jnp.int32) << pair_bits
        tile_ranges = jnp.searchsorted(
            sorted_key, boundaries, side="left"
        ).astype(jnp.int32)
        mx_t, my_t = sorted_ops2[2], sorted_ops2[3]
        pk_t = jnp.stack(sorted_ops2[4 : 4 + pk.shape[1]], axis=1)
        ch_t = jnp.stack(
            sorted_ops2[4 + pk.shape[1] : 4 + pk.shape[1] + chw], axis=1
        )
        pair_feats = jnp.concatenate(
            [
                mx_t[:, None],
                my_t[:, None],
                unpack24(pk_t.astype(jnp.uint32), 4),
                unpack24(ch_t.astype(jnp.uint32), n_chan),
            ],
            axis=1,
        )  # (P, 6 + C)
        binning = Binning(
            pair_gauss=pair_gauss,
            pair_gm=pair_gm,
            slot=slot,
            tile_ranges=tile_ranges,
            offsets=offsets,
            counts=counts,
            depth_order=depth_order,
            counts_orig=counts_all,
            n_pairs=n_pairs,
            n_dropped=n_dropped,
        )
        return binning, pair_feats

    cols = [proj.tiles_min[:, 0], proj.tiles_min[:, 1], rect_w, counts_all]
    # the cull/channel/mask columns are consumed only by the Pallas expand's
    # in-window one-hot select; the XLA fallback re-reads them in original
    # order, so off-TPU they would be pure wasted sort traffic
    if cull and use_pallas:
        cols += [
            proj.means2d[:, 0],
            proj.means2d[:, 1],
            proj.conics[:, 0],
            proj.conics[:, 1],
            proj.conics[:, 2],
            jax.lax.stop_gradient(opacities),
        ]
    if emit_feats:
        chan_sg = jax.lax.stop_gradient(channels)
        cols += [chan_sg[:, j] for j in range(n_chan)]
    mask_idx = None
    if mask_col is not None and use_pallas:
        mask_idx = len(cols)
        cols += [mask_col]
    sorted_cols = jax.lax.sort(
        (sort_depth, iota_n) + tuple(c.astype(jnp.float32) for c in cols),
        num_keys=1,
    )
    depth_order = sorted_cols[1]
    fields_d = jnp.stack(sorted_cols[2:], axis=1)
    counts = fields_d[:, 3].astype(jnp.int32)
    # pair accounting in f32, saturated at 2^24 (the expand sentinel): an
    # int32 cumsum can WRAP when a scale blow-up makes billions of candidate
    # pairs, flipping n_pairs negative and inverting the adaptive-capacity
    # controller exactly when pressure is highest.  f32 additions of
    # nonnegative ints are exact below 2^24 and stay monotone above, which
    # is all the clipped offsets need.
    _SAT = float(2 ** 24)
    cs = jnp.cumsum(counts.astype(jnp.float32))
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.float32), cs[:-1]]
    )
    offsets = jnp.minimum(offsets, _SAT).astype(jnp.int32)
    total_f = jnp.minimum(cs[-1], _SAT)
    n_pairs = jnp.minimum(total_f, float(max_pairs)).astype(jnp.int32)
    n_dropped = (total_f - n_pairs).astype(jnp.int32)

    # ---- expand: pair p -> (depth-rank slot, gaussian, covered tile) -----
    pair_feat_cols: tuple = ()
    if use_pallas:
        # one-pass Pallas merge scan with fused in-window field select (the
        # XLA path below costs ~160 ms at 2M pairs: five random 2M-row
        # gathers + divmod; the kernel does it in ~8 ms)
        from .expand_pallas import expand_bin_pallas

        outs = expand_bin_pallas(
            offsets,
            depth_order,
            fields_d[:, 0],
            fields_d[:, 1],
            fields_d[:, 2],
            grid_x,
            max_pairs,
            tile_size=tile_size,
            num_tiles=num_tiles,
            cull_fields_d=fields_d[:, 4:10] if cull else None,
            chan_fields_d=fields_d[:, 10 : 10 + n_chan] if emit_feats else None,
            mask_d=fields_d[:, mask_idx] if mask_idx is not None else None,
            view_grid_y=view_grid_y,
        )
        slot, g, tile_id = outs[:3]
        pair_feat_cols = outs[3:]  # (6 + C) columns, gm order
    else:
        # scatter-max + cummax: mark[offsets[i]] = i (ties: max i wins = the
        # rule "last gaussian whose offset <= p", identical to
        # searchsorted(side='right') - 1)
        marks = (
            jnp.zeros(max_pairs, jnp.int32)
            .at[offsets]
            .max(iota_n, mode="drop", unique_indices=False)
        )
        slot = jax.lax.cummax(marks)
        g = depth_order[slot]
        from .expand_pallas import f32_divmod

        r = jnp.arange(max_pairs, dtype=jnp.int32) - offsets[slot]
        w = jnp.maximum(rect_w[g], 1)
        qf, remf = f32_divmod(r.astype(jnp.float32), w.astype(jnp.float32))
        q, rem = qf.astype(jnp.int32), remf.astype(jnp.int32)
        tx = proj.tiles_min[g, 0] + rem
        ty = proj.tiles_min[g, 1] + q
        tile_id = ty * grid_x + tx
        if cull:
            from .expand_pallas import (
                MASK_K,
                MASK_NONE,
                _tile_reachable,
                select_nth_set_bit,
            )

            ty_l = ty if not view_grid_y else ty % view_grid_y
            keep = _tile_reachable(
                (tx * tile_size).astype(jnp.float32),
                (ty_l * tile_size).astype(jnp.float32),
                float(tile_size),
                proj.means2d[g, 0],
                proj.means2d[g, 1],
                proj.conics[g, 0],
                proj.conics[g, 1],
                proj.conics[g, 2],
                jax.lax.stop_gradient(opacities)[g],
            )
            tile_id = jnp.where(keep, tile_id, num_tiles)
            # masked (small-rect) gaussians: pair r maps to the r-th
            # REACHABLE rect tile (bit of the precomputed mask), exactly as
            # the pallas kernel does
            m = mask_col[g]
            jsel, found = select_nth_set_bit(m, r)
            jf = jsel.astype(jnp.float32)
            wf = w.astype(jnp.float32)
            qm, rm = f32_divmod(jf, wf)
            tile_m = (
                proj.tiles_min[g, 1].astype(jnp.float32) + qm
            ) * grid_x + proj.tiles_min[g, 0].astype(jnp.float32) + rm
            tile_m = jnp.where(found, tile_m, float(num_tiles)).astype(jnp.int32)
            tile_id = jnp.where(m != MASK_NONE, tile_m, tile_id)
    p = jnp.arange(max_pairs, dtype=jnp.int32)
    valid = p < n_pairs
    safe_tile = jnp.where(valid, tile_id, num_tiles)

    # ---- group by tile (depth order within each tile is free: p is
    # depth-ordered and rides as a tiebreak key / packed low bits); the
    # gaussian index -- and, on the feature path, the per-pair blend feature
    # columns -- ride along as payloads (cheaper than a post-sort gather)
    pair_feats = None
    if packed:
        key = safe_tile << pair_bits | p
        sorted_ops = jax.lax.sort((key, g) + pair_feat_cols, num_keys=1)
        sorted_key, pair_gauss = sorted_ops[0], sorted_ops[1]
        pair_gm = sorted_key & ((1 << pair_bits) - 1)
        boundaries = jnp.arange(num_tiles + 1, dtype=jnp.int32) << pair_bits
        tile_ranges = jnp.searchsorted(
            sorted_key, boundaries, side="left"
        ).astype(jnp.int32)
        if emit_feats:
            pair_feats = jnp.stack(sorted_ops[2:], axis=1)
    else:
        sorted_ops = jax.lax.sort(
            (safe_tile, p, g) + pair_feat_cols, num_keys=2
        )
        sorted_tile, pair_gm, pair_gauss = sorted_ops[:3]
        boundaries = jnp.arange(num_tiles + 1, dtype=jnp.int32)
        tile_ranges = jnp.searchsorted(
            sorted_tile, boundaries, side="left"
        ).astype(jnp.int32)
        if emit_feats:
            pair_feats = jnp.stack(sorted_ops[3:], axis=1)
    binning = Binning(
        pair_gauss=pair_gauss,
        pair_gm=pair_gm,
        slot=slot,
        tile_ranges=tile_ranges,
        offsets=offsets,
        counts=counts,
        depth_order=depth_order,
        counts_orig=counts_all,
        n_pairs=n_pairs,
        n_dropped=n_dropped,
    )
    return binning, pair_feats


# ---------------------------------------------------------------------------
# Scatter-free pair gather with custom VJP
# ---------------------------------------------------------------------------


def _gather_fwd_impl(feats, binning):
    return feats[binning.pair_gauss]


# Bits per gradient value carried through the reduction sort: 21 packs
# 3 values into 2 words (rel err <= 2^-13 ~ 1.2e-4, an order of magnitude
# inside the 1e-3 grad budget) and cuts the 11-operand payload sort to 8
# operands (~1 ms per column at 2M rows, PERF.md).  0 = exact f32 columns;
# 16 = bfloat16 density (over budget; experiments only).
# Overridable without editing code (the bound is relative to the per-segment
# sum of |terms|, so cancellation-heavy scenes can check themselves against
# exact f32 by setting THREESTUDIO_TPU_PACK_GRAD_BITS=0; scripts/
# check_pack_grad.py runs that comparison on hardware).
import os as _os

PACK_GRAD_BITS = int(_os.environ.get("THREESTUDIO_TPU_PACK_GRAD_BITS", "21"))


def _gather_bwd_impl(binning, d_pairs, interpret: bool = False):
    """Transpose of the pair gather without any scatter-add: permute grads to
    gaussian-major order with a payload-carrying sort (a random 2M-row gather
    costs ~49 ms on v5e, the sort ~17 ms), then reduce each Gaussian's
    contiguous range.

    On TPU the sort key is the ORIGINAL gaussian index (sentinel for the
    never-materialized capacity tail), so the Pallas monotone segmented sum
    lands directly in original order -- the old scheme keyed by pair_gm and
    paid a (N, F) row gather to undo the depth sort afterwards (~10 ms at
    1M).  Per-segment offsets come from counts in original order (free:
    computed before the depth sort); when capacity dropped pairs (rare --
    adaptive sizing grows first) a lax.cond pays one extra permute to get
    the kept-counts instead.  Gradient columns ride the sort bit-packed
    (PACK_GRAD_BITS above)."""
    p_total = d_pairs.shape[0]
    n = binning.offsets.shape[0]
    if jax.default_backend() == "tpu" or interpret:
        from .segsum_pallas import segsum_monotone_pallas

        # culled + capacity-tail rows must be zero (pallas blend already
        # zero-fills beyond tile_ranges[-1]; keep the mask for forced-jax
        # blends on TPU)
        valid_tile = (
            jnp.arange(p_total, dtype=jnp.int32) < binning.tile_ranges[-1]
        )[:, None]
        d_safe = jnp.where(valid_tile, d_pairs, 0.0)
        g_key = jnp.where(
            binning.pair_gm < binning.n_pairs, binning.pair_gauss, jnp.int32(n)
        )
        f_dim = d_pairs.shape[1]
        packed_f = 0
        if PACK_GRAD_BITS == 21:
            from .pack import pack21

            packed = pack21(d_safe)
            sorted_cols = jax.lax.sort(
                (g_key,) + tuple(packed[:, j] for j in range(packed.shape[1])),
                num_keys=1,
            )
            # stays packed: the Pallas segsum unpacks in-register
            d_g = jnp.stack(sorted_cols[1:], axis=1)
            packed_f = f_dim
        elif PACK_GRAD_BITS == 16:
            from .pack import pack16, unpack16

            packed = pack16(d_safe)
            sorted_cols = jax.lax.sort(
                (g_key,) + tuple(packed[:, j] for j in range(packed.shape[1])),
                num_keys=1,
            )
            d_g = unpack16(jnp.stack(sorted_cols[1:], axis=1), f_dim)
        else:
            sorted_cols = jax.lax.sort(
                (g_key,) + tuple(d_safe[:, j] for j in range(f_dim)),
                num_keys=1,
            )
            d_g = jnp.stack(sorted_cols[1:], axis=1)
        counts_o = jax.lax.cond(
            binning.n_dropped > 0,
            lambda: jnp.clip(p_total - binning.offsets, 0, binning.counts)[
                binning.inv_depth_order
            ],
            lambda: binning.counts_orig,
        )
        offs_o = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(counts_o)[:-1]]
        )
        return segsum_monotone_pallas(
            d_g, sorted_cols[0], binning.n_pairs, n, seg_offsets=offs_o,
            interpret=interpret, packed_f=packed_f,
        )
    sorted_cols = jax.lax.sort(
        (binning.pair_gm,) + tuple(d_pairs[:, j] for j in range(d_pairs.shape[1])),
        num_keys=1,
    )
    d_gm = jnp.stack(sorted_cols[1:], axis=1)
    # zero out the invalid tail (pairs >= n_pairs carry garbage rows)
    valid = (jnp.arange(p_total, dtype=jnp.int32) < binning.n_pairs)[:, None]
    d_gm = jnp.where(valid, d_gm, 0.0)
    prefix = jnp.concatenate(
        [
            jnp.zeros((1, d_pairs.shape[1]), d_pairs.dtype),
            jnp.cumsum(d_gm, axis=0),
        ]
    )
    lo = jnp.clip(binning.offsets, 0, binning.n_pairs)
    hi = jnp.clip(binning.offsets + binning.counts, 0, binning.n_pairs)
    d_sorted = prefix[hi] - prefix[lo]  # (N, F), depth order
    return d_sorted[binning.inv_depth_order]



@jax.custom_vjp
def pair_gather(feats: jnp.ndarray, binning: Binning) -> jnp.ndarray:
    """(N, F) per-Gaussian features -> (P, F) tile-ordered per-pair rows."""
    return _gather_fwd_impl(feats, binning)


def _pair_gather_fwd(feats, binning):
    return _gather_fwd_impl(feats, binning), binning


def _pair_gather_bwd(binning, d_pairs):
    import numpy as np

    d_feats = _gather_bwd_impl(binning, d_pairs)
    zero_binning = jax.tree_util.tree_map(
        lambda leaf: np.zeros(leaf.shape, jax.dtypes.float0), binning
    )
    return (d_feats, zero_binning)


pair_gather.defvjp(_pair_gather_fwd, _pair_gather_bwd)


@jax.custom_vjp
def pair_select(
    feats: jnp.ndarray, pair_feats: jnp.ndarray, binning: Binning
) -> jnp.ndarray:
    """Differentiable boundary for the fused pair-feature path: forward
    returns `pair_feats` (the tile-ordered feature table already produced by
    bin_gaussians_with_feats, numerically == feats[binning.pair_gauss] up to
    ~1 ulp from the bf16-split one-hot select); backward routes the per-pair
    gradients to `feats` with the same scatter-free transpose as
    pair_gather (sort-permute to gaussian-major + Pallas segmented sum)."""
    return pair_feats


def _pair_select_fwd(feats, pair_feats, binning):
    return pair_feats, binning


def _pair_select_bwd(binning, d_pairs):
    import numpy as np

    d_feats = _gather_bwd_impl(binning, d_pairs)
    zero_binning = jax.tree_util.tree_map(
        lambda leaf: np.zeros(leaf.shape, jax.dtypes.float0), binning
    )
    # pair_feats came from stop_gradient'd binning inputs: its cotangent is
    # dead by construction (XLA drops the zeros)
    return (d_feats, jnp.zeros_like(d_pairs), zero_binning)


pair_select.defvjp(_pair_select_fwd, _pair_select_bwd)
