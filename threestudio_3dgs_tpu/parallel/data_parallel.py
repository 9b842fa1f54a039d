"""Camera-sharded data-parallel training step.

The reference renders its camera batch in a sequential python loop on one GPU
(reference renderer/gaussian_batch_renderer.py:21).  Here the batch axis is a
mesh axis: each device renders its camera shard against the replicated
Gaussian field, per-parameter gradients are psum-reduced over ICI inside
shard_map (overlapping with XLA's backward schedule), and the Adam update +
densification-statistics accumulation run identically on every device --
replicated state stays bit-identical without further communication.

This is the `shard_map`-based path the dry-run validates on a virtual CPU
mesh (SURVEY.md section 4 level 4); on hardware the same code spans a pod
slice (ICI in-slice, DCN across hosts via jax.distributed)."""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..models import gaussian_field as gf
from ..models.optim import adam_update
from ..systems.base import SystemState

# chunks per large gradient leaf for the pipelined psum (1 = single
# collective per leaf); overridable for A/B measurement
import os as _os

GRAD_PSUM_CHUNKS = int(_os.environ.get("THREESTUDIO_TPU_PSUM_CHUNKS", "4"))


def chunked_pmean(tree, axis: str, chunks: int = 4):
    """pmean each leaf in row chunks: numerically identical (chunks
    partition rows; each element is reduced exactly once), but the K
    independent collectives per leaf pipeline over ICI and can overlap the
    still-running backward of OTHER leaves under XLA's async-collective
    scheduler.  Leaves too small to matter go through one pmean."""
    if chunks <= 1:
        return jax.tree_util.tree_map(
            lambda x: jax.lax.pmean(x, axis), tree
        )

    def leaf(x):
        n = x.shape[0] if x.ndim else 0
        if x.ndim == 0 or n < chunks or x.size < 64 * 1024:
            return jax.lax.pmean(x, axis)
        bounds = [n * i // chunks for i in range(chunks + 1)]
        parts = [
            jax.lax.pmean(
                jax.lax.slice_in_dim(x, bounds[i], bounds[i + 1], axis=0),
                axis,
            )
            for i in range(chunks)
        ]
        return jax.lax.concatenate(parts, 0)

    return jax.tree_util.tree_map(leaf, tree)


def make_dp_train_step(
    system,
    mesh: Mesh,
    height: int,
    width: int,
    global_batch: int,
    axis: str = "data",
):
    """Build a jitted data-parallel train step for a BaseGaussianSystem.

    Requires global_batch % mesh.shape[axis] == 0.  Returns
    step(state, dev_batch, key, sched) -> (state, logs) with `state`
    replicated and `dev_batch` camera-sharded along `axis`.
    """
    n_dev = mesh.shape[axis]
    assert global_batch % n_dev == 0, (global_batch, n_dev)

    replicated = PartitionSpec()
    sharded = PartitionSpec(axis)

    def per_device_grads(gauss_params, extra_params, gauss_rest, batch_shard, key, sched):
        """Runs on each device with its camera shard; returns psum'd grads."""
        local_bs = global_batch // n_dev
        cap = gauss_rest.alive.shape[0]
        vs_dummy = jnp.zeros((local_bs, cap, 2))

        def loss_fn(gp, ep, vs):
            gs = gauss_rest.replace(params=gp)
            k_render, k_loss = jax.random.split(key)
            out = system.render_batch(
                gs, ep, batch_shard, height, width, k_render, sched, True,
                vs_dummy=vs,
            )
            total, logs = system.compute_loss(out, gs, ep, batch_shard, sched, k_loss)
            return total, (out, logs)

        (g_gauss, g_extra, g_vs), (out, logs) = jax.grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(gauss_params, extra_params, vs_dummy)

        # gradient all-reduce over the camera axis (ICI collective).  pmean
        # matches the single-device full-batch loss exactly: per-shard means
        # average to the global mean, and batch-independent regularizers are
        # identical on every device (pmean is the identity there).
        #
        # The per-Gaussian grads psum CHUNKED (north-star overlap clause,
        # BASELINE.json): each parameter leaf already issues its own
        # all-reduce -- a leaf's collective is schedulable as soon as ITS
        # backward slice finishes (colors after the pair-grad reduction,
        # xyz only after project bwd), and chunking the big leaves further
        # lets XLA's async collectives pipeline reduce-scatter phases over
        # ICI while the remaining backward still runs.  Numerically
        # identical (chunks partition rows); ~zero cost on one device
        # (measured, PERF.md round-4 'Communication budget').
        g_gauss = chunked_pmean(g_gauss, axis, chunks=GRAD_PSUM_CHUNKS)
        g_extra = jax.lax.pmean(g_extra, axis)
        logs = jax.tree_util.tree_map(lambda x: jax.lax.pmean(x, axis), logs)

        # densification stats reduce over the full camera batch too
        radii = jax.lax.pmax(
            jnp.max(out["radii"].astype(jnp.float32), axis=0), axis
        )
        vis_sum = jax.lax.psum(
            jnp.sum(out["visibility_filter"].astype(jnp.float32), axis=0), axis
        )
        grad_sum = jax.lax.psum(
            jnp.sum(
                jnp.where(
                    out["visibility_filter"],
                    jnp.linalg.norm(g_vs, axis=-1),
                    0.0,
                ),
                axis=0,
            ),
            axis,
        )
        # adaptive pair-capacity signals (systems/base.py _adapt_pair_capacity):
        # per-view pair DEMAND maxed over the GLOBAL camera batch, drops summed
        logs = dict(logs)
        logs["n_dropped_pairs"] = jax.lax.psum(jnp.sum(out["n_dropped"]), axis)
        logs["n_pairs_max"] = jax.lax.pmax(
            jnp.max(out["n_pairs"] + out["n_dropped"]), axis
        )
        return g_gauss, g_extra, radii, vis_sum, grad_sum, logs

    specs = dict(
        mesh=mesh,
        in_specs=(replicated, replicated, replicated, sharded, replicated, replicated),
        out_specs=(
            replicated, replicated, replicated, replicated, replicated, replicated,
        ),
    )
    try:
        from jax import shard_map

        sharded_grads = shard_map(per_device_grads, check_vma=False, **specs)
    except (ImportError, TypeError):
        from jax.experimental.shard_map import shard_map

        sharded_grads = shard_map(per_device_grads, check_rep=False, **specs)

    def step(state: SystemState, dev_batch: Dict[str, Any], key, sched):
        g_gauss, g_extra, radii_max, vis_sum, grad_sum, logs = sharded_grads(
            state.gauss.params,
            state.extra_params,
            state.gauss,
            dev_batch,
            key,
            sched,
        )
        gauss = gf.apply_gradients(state.gauss, g_gauss, sched["lrs"])
        if state.extra_params:
            lr_tree = jax.tree_util.tree_map(
                lambda _: sched["extra_lr"], state.extra_params
            )
            new_extra, new_opt = adam_update(
                state.extra_params, g_extra, state.extra_opt, lr_tree, eps=1e-8
            )
        else:
            new_extra, new_opt = state.extra_params, state.extra_opt
        gauss = gauss.replace(
            max_radii2d=jnp.maximum(gauss.max_radii2d, radii_max),
            xyz_grad_accum=gauss.xyz_grad_accum + grad_sum,
            denom=gauss.denom + vis_sum,
        )
        return (
            SystemState(gauss=gauss, extra_params=new_extra, extra_opt=new_opt),
            logs,
        )

    return jax.jit(step)


def shard_batch(
    mesh: Mesh,
    batch: Dict[str, Any],
    axis: str = "data",
    batch_size: "int | None" = None,
):
    """Place camera-batched arrays with the batch axis sharded on the mesh.

    An entry is sharded only when its leading dim equals the global camera
    batch size (taken from `batch_size`, falling back to the c2w row count):
    mere divisibility by the mesh size would silently mis-shard any aux
    entry whose first dim coincidentally divides it (e.g. an (n*k,)-shaped
    table), which must replicate instead."""
    sharding = NamedSharding(mesh, PartitionSpec(axis))
    out = {}
    n = mesh.shape[axis]
    if batch_size is None and "c2w" in batch and hasattr(batch["c2w"], "shape"):
        batch_size = int(batch["c2w"].shape[0])
    for k, v in batch.items():
        is_batched = (
            hasattr(v, "ndim")
            and v.ndim >= 1
            and v.shape[0] > 0
            and v.shape[0] % n == 0
            and (batch_size is None or v.shape[0] == batch_size)
        )
        if is_batched:
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = v
    return out
