"""Pallas TPU kernel: segmented sum over a monotone (non-decreasing) segment
id sequence -- the per-Gaussian gradient reduction of the rasterizer backward.

XLA's general paths cost ~100 ms at 2-4M pairs on v5e (segment_sum lowers to
serialized scatter-add; cumsum+gather-diff pays log-pass traffic).

Output-tiled design: one grid program per OUTPUT tile of SEGT consecutive
segment ids.  Program k owns columns [k*SEGT, (k+1)*SEGT) exclusively, so
  * there are NO cross-program carries and NO read-modify-write of the
    output -- the previous design's serialized window RMW (3 DMA latencies
    per program over 2048 programs) dominated its runtime;
  * the pair range feeding tile k is [offsets[k*SEGT], offsets[(k+1)*SEGT])
    (monotone slots), prefetched as a scalar array; edge pair-blocks shared
    with neighboring programs need no masking: their slots fall outside the
    tile's column window and the one-hot select drops them;
  * within a block the partial reduction is a one-hot MXU matmul, chunked
    over the output columns; values ride a 3-term bf16 split (the one-hot
    side is exact in bf16) -- 3 MXU passes vs 6 for f32 HIGHEST;
  * pair blocks stream with cross-iteration double buffering.

Rows >= n_pairs must be zero in `vals` (caller masks them); their slot ids
are garbage but at worst select zero rows."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEGT = 1024  # output segment ids per grid program
BLK = 1024  # pairs per inner block
CCHUNK = 512  # output columns per one-hot matmul chunk


def _kernel(starts_ref, vals_hbm, slots_hbm, out_hbm, vscr, sscr, oscr,
            sem_v, sem_s, sem_w, *, f8, nblk, packed_f=0):
    k = pl.program_id(0)
    col0 = k * SEGT
    start = starts_ref[k]
    end = starts_ref[k + 1]
    b0 = start // BLK
    b1 = jnp.minimum(pl.cdiv(end, BLK), nblk)

    def rd(b, s):
        cv = pltpu.make_async_copy(vals_hbm.at[b], vscr.at[s], sem_v.at[s])
        cs = pltpu.make_async_copy(slots_hbm.at[b], sscr.at[s], sem_s.at[s])
        return cv, cs

    @pl.when(b0 < b1)
    def _():
        for c in rd(b0, 0):
            c.start()

    def body(i, acc):
        b = b0 + i
        s = jax.lax.rem(i, 2)

        @pl.when(b + 1 < b1)
        def _():
            for c in rd(b + 1, 1 - s):
                c.start()

        for c in rd(b, s):
            c.wait()
        rel = sscr[s][0:1, :] - col0  # (1, BLK) target column per pair
        if packed_f:
            # 21-bit packed gradient words straight off the reduction sort:
            # unpack in-register, skipping the (P, F) f32 intermediate the
            # XLA-side unpack would materialize (~160 MB r+w at 2M pairs)
            from .pack import unpack21_rows

            v_un = unpack21_rows(vscr[s], packed_f)  # (packed_f, BLK)
            v_f32 = jnp.concatenate(
                [v_un, jnp.zeros((f8 - packed_f, v_un.shape[1]), jnp.float32)],
                axis=0,
            )
        else:
            v_f32 = vscr[s]  # (F8, BLK)
        # 2-term bf16 split (residual ~2^-18 relative): these are gradient
        # sums with no compounding carry, well under grad noise tolerance
        v_hi = v_f32.astype(jnp.bfloat16)
        v_lo = (v_f32 - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        parts = []
        for c in range(SEGT // CCHUNK):
            lanes = c * CCHUNK + jax.lax.broadcasted_iota(
                jnp.int32, (1, CCHUNK), 1
            )
            onehot = (rel.reshape(BLK, 1) == lanes).astype(jnp.bfloat16)

            def mm(a):
                return jax.lax.dot_general(
                    a,
                    onehot,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (F8, CCHUNK)

            parts.append(mm(v_hi) + mm(v_lo))
        return acc + jnp.concatenate(parts, axis=1)

    acc = jax.lax.fori_loop(
        0, b1 - b0, body, jnp.zeros((f8, SEGT), jnp.float32)
    )
    oscr[...] = acc
    wr = pltpu.make_async_copy(oscr, out_hbm.at[:, pl.ds(col0, SEGT)], sem_w)
    wr.start()
    wr.wait()


def segsum_monotone_pallas(
    vals: jnp.ndarray,  # (P, F) rows, gaussian-major order
    slots: jnp.ndarray,  # (P,) int32 non-decreasing segment ids (valid region)
    n_pairs: jnp.ndarray,  # () int32 -- rows beyond are garbage, must be 0-masked
    n_segments: int,
    interpret: bool = False,
    seg_offsets: jnp.ndarray | None = None,  # (n_segments,) first pair per seg
    packed_f: int = 0,  # >0: vals is (P, W) uint32 pack21 words of packed_f cols
) -> jnp.ndarray:
    """Returns (n_segments, F) sums.  Rows >= n_pairs must already be zero in
    `vals` (the caller masks them; their slots may be garbage -- they select
    zero rows at worst).  `seg_offsets` (binning.offsets) skips the
    searchsorted for the per-tile pair ranges.  With `packed_f`, the value
    columns arrive as 21-bit packed words (ops/rasterizer/pack.py) and are
    unpacked in-register -- half the input DMA and no f32 intermediate."""
    p, w_or_f = vals.shape
    f = packed_f or w_or_f
    f8 = (f + 7) // 8 * 8
    nblk = (p + BLK - 1) // BLK
    p_pad = nblk * BLK
    nk = (n_segments + SEGT - 1) // SEGT
    n_pad = nk * SEGT

    if packed_f:
        w8 = (w_or_f + 7) // 8 * 8
        vals_b = (
            jnp.pad(vals, ((0, p_pad - p), (0, w8 - w_or_f)))
            .reshape(nblk, BLK, w8)
            .transpose(0, 2, 1)
        )  # (NBLK, W8, BLK) uint32
    else:
        vals_b = (
            jnp.pad(vals, ((0, p_pad - p), (0, f8 - f)))
            .reshape(nblk, BLK, f8)
            .transpose(0, 2, 1)
        )  # (NBLK, F8, BLK)
    slots_p = jnp.pad(slots, (0, p_pad - p), constant_values=-1)
    slots_b = jnp.broadcast_to(
        slots_p.reshape(nblk, 1, BLK), (nblk, 8, BLK)
    ).astype(jnp.int32)

    # pair range per output tile: first pair of segment k*SEGT
    if seg_offsets is not None:
        pad_off = jnp.pad(
            seg_offsets.astype(jnp.int32),
            (0, n_pad - seg_offsets.shape[0] + 1),
            constant_values=2**30,
        )
        starts = pad_off[:: SEGT][: nk + 1]
    else:  # self-contained fallback: searchsorted over the valid region
        bounds = jnp.arange(nk + 1, dtype=jnp.int32) * SEGT
        starts = jnp.searchsorted(
            jnp.where(jnp.arange(p, dtype=jnp.int32) < n_pairs, slots, 2**30),
            bounds,
            side="left",
        ).astype(jnp.int32)
    starts = jnp.minimum(starts, n_pairs).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM(
                (2,) + vals_b.shape[1:],
                jnp.uint32 if packed_f else jnp.float32,
            ),
            pltpu.VMEM((2, 8, BLK), jnp.int32),
            pltpu.VMEM((f8, SEGT), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, f8=f8, nblk=nblk, packed_f=packed_f),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f8, n_pad), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, vals_b, slots_b)
    return out[:f, :n_segments].T
