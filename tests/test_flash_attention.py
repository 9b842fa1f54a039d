"""Pallas flash-attention kernel (ops/flash_attention.py): parity with the
materialized einsum oracle (interpret mode on CPU), wrapper routing, and the
UNet integration flag."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from threestudio_3dgs_tpu.ops.flash_attention import (
    _flash_bhnd,
    attention,
    attention_reference,
)


def _qkv(key, b, h, n, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, n, h, d), dtype)
    k = jax.random.normal(kk, (b, n, h, d), dtype)
    v = jax.random.normal(kv, (b, n, h, d), dtype)
    return q, k, v


@pytest.mark.parametrize("n,d", [(512, 64), (256, 32), (1024, 64)])
def test_flash_kernel_matches_einsum_oracle(n, d):
    b, h = 2, 3
    q, k, v = _qkv(jax.random.PRNGKey(0), b, h, n, d)
    scale = 1.0 / float(np.sqrt(d))
    ref = attention_reference(q, k, v, scale)
    qf = jnp.transpose(q, (0, 2, 1, 3)).reshape(b * h, n, d)
    kf = jnp.transpose(k, (0, 2, 1, 3)).reshape(b * h, n, d)
    vf = jnp.transpose(v, (0, 2, 1, 3)).reshape(b * h, n, d)
    out = _flash_bhnd(qf, kf, vf, scale, interpret=True)
    out = jnp.transpose(out.reshape(b, h, n, d), (0, 2, 1, 3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_kernel_bf16_inputs():
    """bf16 q/k/v with f32 softmax inside the kernel: stays within bf16
    matmul tolerance of the f32 oracle."""
    b, h, n, d = 1, 2, 512, 64
    q, k, v = _qkv(jax.random.PRNGKey(1), b, h, n, d)
    scale = 1.0 / float(np.sqrt(d))
    ref = attention_reference(q, k, v, scale)
    to16 = lambda x: jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, n, d).astype(
        jnp.bfloat16
    )
    out = _flash_bhnd(to16(q), to16(k), to16(v), scale, interpret=True)
    out = jnp.transpose(
        out.astype(jnp.float32).reshape(b, h, n, d), (0, 2, 1, 3)
    )
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert err < 3e-2, err


def test_wrapper_falls_back_off_tpu():
    """On CPU the wrapper must route to the einsum path (bit-identical)."""
    b, h, n, d = 1, 2, 2048, 64
    q, k, v = _qkv(jax.random.PRNGKey(2), b, h, n, d)
    scale = 1.0 / float(np.sqrt(d))
    out = attention(q, k, v, scale, use_flash=True)
    ref = attention_reference(q, k, v, scale)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_unet_flash_flag_parity_cpu():
    """use_flash_attention=True must not change UNet outputs on CPU (the
    wrapper falls back), so the flag is safe in shared configs."""
    import dataclasses

    from threestudio_3dgs_tpu.diffusion import UNet2DCondition
    from tests.test_diffusion import TINY_UNET

    model = UNet2DCondition(TINY_UNET)
    model_fl = UNet2DCondition(
        dataclasses.replace(TINY_UNET, use_flash_attention=True)
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    t = jnp.array([10, 500], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 48))
    params = model.init(key, x, t, ctx)
    out = model.apply(params, x, t, ctx)
    out_fl = model_fl.apply(params, x, t, ctx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_fl))
