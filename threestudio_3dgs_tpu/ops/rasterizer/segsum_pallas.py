"""Pallas TPU kernel: segmented sum over a monotone (non-decreasing) segment
id sequence -- the per-Gaussian gradient reduction of the rasterizer backward.

XLA's general paths cost ~100 ms at 2-4M pairs on v5e (segment_sum lowers to
serialized scatter-add; cumsum+gather-diff pays log-pass traffic).
Monotonicity enables a one-pass streaming kernel:

  * pairs stream in groups of GROUP=1024 (gaussian-major order);
  * within a group all segment ids lie in [s0, s0 + GROUP - 1] (every visible
    Gaussian owns >= 1 consecutive pairs), so a (GROUP, WIN) one-hot matrix
    against a 128-aligned window turns the partial reduction into ONE MXU
    matmul (F8 x GROUP) @ (GROUP x WIN);
  * the window accumulates into the (F8, N) output with an aligned
    read-modify-write; grid programs run sequentially, so overlapping windows
    of adjacent groups compose correctly;
  * the output buffer is an input alias (zero-initialized outside): untouched
    regions must stay zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 1024  # pairs per grid program
WIN = GROUP + 256  # output window (span <= GROUP-1, alignment slack 127)


def _kernel(nseg_ref, vals_hbm, slots_hbm, acc_in_hbm, out_hbm, vscr, sscr, wscr,
            sem_v, sem_s, sem_w, *, f8):
    b = pl.program_id(0)

    cv = pltpu.make_async_copy(vals_hbm.at[b], vscr, sem_v)
    cv.start()
    cs = pltpu.make_async_copy(slots_hbm.at[b], sscr, sem_s)
    cs.start()
    cs.wait()
    cv.wait()

    slots = sscr[0:1, :]  # (1, GROUP) int32
    s0 = sscr[0, 0]
    w0 = (s0 // 128) * 128  # 128-aligned window base, s0 - w0 <= 127

    rd = pltpu.make_async_copy(acc_in_hbm.at[:, pl.ds(w0, WIN)], wscr, sem_w)
    rd.start()

    rel = slots.reshape(GROUP, 1) - w0
    vals_block = vscr[...]  # (F8, GROUP)
    # chunk the one-hot over the window to bound VMEM (full (GROUP, WIN)
    # materialization is ~11 MB with intermediates)
    wchunk = 256
    partials = []
    for c in range(WIN // wchunk):
        lanes = c * wchunk + jax.lax.broadcasted_iota(
            jnp.int32, (GROUP, wchunk), 1
        )
        onehot = (lanes == rel).astype(jnp.float32)  # (GROUP, wchunk)
        partials.append(
            jax.lax.dot_general(
                vals_block,
                onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        )  # (F8, wchunk)
    partial = jnp.concatenate(partials, axis=1)  # (F8, WIN)

    rd.wait()
    wscr[...] += partial
    wr = pltpu.make_async_copy(wscr, out_hbm.at[:, pl.ds(w0, WIN)], sem_w)
    wr.start()
    wr.wait()


def segsum_monotone_pallas(
    vals: jnp.ndarray,  # (P, F) rows, gaussian-major order
    slots: jnp.ndarray,  # (P,) int32 non-decreasing segment ids (valid region)
    n_pairs: jnp.ndarray,  # () int32 -- rows beyond are garbage, must be 0-masked
    n_segments: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (n_segments, F) sums.  Rows >= n_pairs must already be zero in
    `vals` (the caller masks them; their slots may be garbage -- they land
    outside the window or add zeros)."""
    p, f = vals.shape
    f8 = (f + 7) // 8 * 8
    nb = (p + GROUP - 1) // GROUP
    p_pad = nb * GROUP
    n_pad = ((n_segments + WIN - 1) // WIN + 1) * WIN

    vals_b = (
        jnp.pad(vals, ((0, p_pad - p), (0, f8 - f)))
        .reshape(nb, GROUP, f8)
        .transpose(0, 2, 1)
    )  # (NB, F8, GROUP)
    slots_p = jnp.pad(slots, (0, p_pad - p), constant_values=0)
    slots_b = jnp.broadcast_to(
        slots_p.reshape(nb, 1, GROUP), (nb, 8, GROUP)
    ).astype(jnp.int32)

    acc0 = jnp.zeros((f8, n_pad), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((f8, GROUP), jnp.float32),
            pltpu.VMEM((8, GROUP), jnp.int32),
            pltpu.VMEM((f8, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, f8=f8),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f8, n_pad), jnp.float32),
        input_output_aliases={3: 0},  # acc0 (after the prefetch arg) -> out
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.array([0], jnp.int32), vals_b, slots_b, acc0)
    return out[:f, :n_segments].T
