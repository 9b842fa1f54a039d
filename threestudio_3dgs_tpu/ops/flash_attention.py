"""Pallas TPU flash attention (forward-only) for the diffusion UNet.

The UNet is stop-gradient'd inside SDS (guidance/sds.py: the score network is
never differentiated -- grad = w*(eps_pred - eps) is constructed under
stop_gradient, reference guidance/temporal_zero123_guidance.py:336-364), so
the guidance hot path only needs a FORWARD attention kernel.  XLA's
materialized path writes the (N, N) logits + probabilities to HBM twice per
self-attention block; at the UNet's 4096-token level that is ~2 x 64 MB of
f32 round trips per block per image -- the dominant HBM cost of the UNet.

Design (TPU-first, not a GPU flash port): at diffusion scales the FULL K and
V for one (batch, head) fit comfortably in VMEM (Nk <= 4096, D = 64:
2 x 1 MB f32), so there is no need for online-softmax accumulation across KV
blocks.  Grid = (B*H, Nq/BQ); each program loads one Q block plus the whole
K/V, computes S = QK^T on the MXU with f32 accumulation, takes an exact
(not running) row softmax in VMEM, and writes O = P V.  One pass, no
rescaling corrections, numerically identical to the reference einsum up to
matmul re-association.

Falls back to the einsum path off-TPU (CPU tests) and for short sequences
where the materialized logits are cheap (cross-attention Nk = 77).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 256  # query rows per grid program


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (Nk, D)
    v = v_ref[0]  # (Nk, D)
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (BQ, Nk) f32
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, D) f32
    o_ref[0] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _flash_bhnd(q, k, v, scale, interpret=False):
    bh, nq, d = q.shape
    nk = k.shape[1]
    bq = min(BQ, nq)
    grid = (bh, nq // bq)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, nk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, nk, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        interpret=interpret,
    )(q, k, v)


def attention_reference(q, k, v, scale):
    """Materialized einsum attention, f32 softmax -- the oracle and the
    off-TPU / short-sequence fallback.  (B, N, H, D) layout."""
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", weights, v)


def attention(q, k, v, scale, use_flash=True, min_seq=1024):
    """Multi-head attention, (B, N, H, D) layout (the UNet's reshape order).

    Routes to the Pallas flash kernel on TPU when the query sequence is long
    enough for materialized logits to be HBM-bound and shapes are
    tile-friendly; einsum otherwise.  Forward-only: do not differentiate
    through the flash path (the SDS denoiser is stop-gradient'd)."""
    b, n, h, d = q.shape
    m = k.shape[1]
    ok = (
        use_flash
        and jax.default_backend() == "tpu"
        and n >= min_seq
        and n == m  # self-attention
        and n % min(BQ, n) == 0
        and d % 8 == 0
    )
    if not ok:
        return attention_reference(q, k, v, scale)
    qf = jnp.transpose(q, (0, 2, 1, 3)).reshape(b * h, n, d)
    kf = jnp.transpose(k, (0, 2, 1, 3)).reshape(b * h, m, d)
    vf = jnp.transpose(v, (0, 2, 1, 3)).reshape(b * h, m, d)
    of = _flash_bhnd(qf, kf, vf, float(scale))
    return jnp.transpose(of.reshape(b, h, n, d), (0, 2, 1, 3))
