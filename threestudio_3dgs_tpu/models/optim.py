"""Per-group Adam for Gaussian fields (functional, surgery-friendly).

The reference keeps one torch.optim.Adam with a param group per Gaussian
attribute, eps=1e-15, per-group exponentially-scheduled learning rates, and
mutates the moment tensors in place when points are cloned/split/pruned
(reference geometry/gaussian_base.py:470-682).  Here the moments are ordinary
arrays in the training state pytree, so "optimizer surgery" is just the same
masked scatter that rewrites the parameters -- no state-dict gymnastics.

Bias correction matches torch.optim.Adam: m_hat = m/(1-b1^t), v_hat = v/(1-b2^t),
update = lr * m_hat / (sqrt(v_hat) + eps).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class AdamState:
    mu: Any  # pytree like params
    nu: Any  # pytree like params
    count: jnp.ndarray  # () int32, shared step counter


def init_adam(params: Any) -> AdamState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(
        mu=zeros, nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        count=jnp.zeros((), jnp.int32),
    )


def adam_update(
    params: Any,
    grads: Any,
    state: AdamState,
    lr_tree: Any,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
) -> tuple[Any, AdamState]:
    """One Adam step.  `lr_tree` is a pytree of per-leaf scalar learning rates
    matching the structure of `params` (build with `lr_tree_like`)."""
    count = state.count + 1
    t = count.astype(jnp.float32)
    c1 = 1.0 - b1 ** t
    c2 = 1.0 - b2 ** t

    def upd(p, g, m, v, lr):
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * g * g
        step = lr * (m / c1) / (jnp.sqrt(v / c2) + eps)
        return p - step, m, v

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.mu)
    flat_v = treedef.flatten_up_to(state.nu)
    flat_lr = treedef.flatten_up_to(lr_tree)
    out = [upd(p, g, m, v, lr) for p, g, m, v, lr in zip(flat_p, flat_g, flat_m, flat_v, flat_lr)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_p, AdamState(mu=new_m, nu=new_v, count=count)


def zero_moments_at(state: AdamState, rows: jnp.ndarray) -> AdamState:
    """Zero the Adam moments for the given row indices in every leaf (the
    reference zeroes new rows' exp_avg/exp_avg_sq at geometry/gaussian_base.py
    :595-596,653-663).  Out-of-range indices are dropped."""

    def z(leaf):
        return leaf.at[rows].set(0.0, mode="drop")

    return state.replace(
        mu=jax.tree_util.tree_map(z, state.mu),
        nu=jax.tree_util.tree_map(z, state.nu),
    )


def zero_moments_field(state: AdamState, field: str) -> AdamState:
    """Zero all moments of one named field (reference
    replace_tensor_to_optimizer, geometry/gaussian_base.py:589-603)."""
    mu = state.mu.replace(**{field: jnp.zeros_like(getattr(state.mu, field))})
    nu = state.nu.replace(**{field: jnp.zeros_like(getattr(state.nu, field))})
    return state.replace(mu=mu, nu=nu)
