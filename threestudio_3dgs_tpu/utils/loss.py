"""Loss helpers (host-framework utilities the reference imports:
`tv_loss` at reference system/gaussian_splatting.py:9)."""

from __future__ import annotations

import jax.numpy as jnp


def tv_loss(img: jnp.ndarray) -> jnp.ndarray:
    """Total variation on (B, H, W, C) images (threestudio's tv_loss operates
    on BCHW; channel position does not change the value)."""
    h_diff = img[:, 1:, :, :] - img[:, :-1, :, :]
    w_diff = img[:, :, 1:, :] - img[:, :, :-1, :]
    return jnp.mean(h_diff ** 2) + jnp.mean(w_diff ** 2)


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def mse_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def pearson_correlation(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-6):
    """Pearson correlation over flattened inputs (used by the relative-depth
    loss, reference system/gaussian_zero123.py:139-147)."""
    a = a.reshape(-1)
    b = b.reshape(-1)
    a = a - jnp.mean(a)
    b = b - jnp.mean(b)
    return jnp.sum(a * b) / jnp.maximum(
        jnp.linalg.norm(a) * jnp.linalg.norm(b), eps
    )


def psnr(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    mse = jnp.mean((pred - target) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, eps))
