"""System base: functional training orchestration.

Replaces the reference's Lightning-based BaseLift3DSystem (SURVEY.md L7).
A system owns host-side component objects (geometry wrapper, renderer,
guidance) and compiles ONE jitted train step per (height, width, batch_size):

    (SystemState, device batch, key, sched scalars) -> (SystemState', logs)

Scheduled hyperparameters (per-group LRs, color_clip, loss lambdas, the SDS
timestep window, material warmup flags) are evaluated host-side with C() each
step and enter the graph as traced scalars -- values change every step, the
compiled graph never does.  Structural updates (densify/prune) run as
separate jitted ops at their intervals, exactly like the reference's
update_states gating (reference geometry/gaussian_base.py:853-869)."""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..models import gaussian_field as gf
from ..models.optim import AdamState, adam_update, init_adam
from ..utils.config import C, parse_structured
from ..utils.registry import find
from ..utils.saving import save_image_grid


@struct.dataclass
class SystemState:
    gauss: gf.GaussianState
    extra_params: Any  # dict pytree: background mlp, deformation nets, ...
    extra_opt: AdamState


@dataclasses.dataclass
class BaseSystemConfig:
    geometry_type: str = "gaussian-splatting"
    geometry: dict = dataclasses.field(default_factory=dict)
    geometry_convert_from: str = ""
    material_type: Optional[str] = None
    material: dict = dataclasses.field(default_factory=dict)
    background_type: Optional[str] = None
    background: dict = dataclasses.field(default_factory=dict)
    renderer_type: str = "diff-gaussian-rasterizer"
    renderer: dict = dataclasses.field(default_factory=dict)
    guidance_type: str = "fake-sds-guidance"
    guidance: dict = dataclasses.field(default_factory=dict)
    prompt_processor_type: str = "dummy-prompt-processor"
    prompt_processor: dict = dataclasses.field(default_factory=dict)
    exporter_type: str = "gaussian-mesh-exporter"
    exporter: dict = dataclasses.field(default_factory=dict)
    loss: dict = dataclasses.field(default_factory=dict)
    optimizer: dict = dataclasses.field(default_factory=dict)
    freq: dict = dataclasses.field(default_factory=dict)
    visualize_samples: bool = False


def to_device_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    """numpy batch -> jnp arrays.  height/width stay OUT of the device batch
    (they are static shape information, threaded separately)."""
    out = {}
    for k, v in batch.items():
        if v is None or k in ("height", "width"):
            continue
        if k == "random_camera" and isinstance(v, dict):
            out[k] = to_device_batch(v)
        elif isinstance(v, np.ndarray):
            out[k] = jnp.asarray(v)
        elif isinstance(v, (int, float)):
            out[k] = jnp.asarray(v)
        else:
            out[k] = v
    return out


class BaseGaussianSystem:
    Config = BaseSystemConfig

    def __init__(self, cfg=None, **kwargs):
        if cfg is None:
            cfg = self.Config(**kwargs)
        elif isinstance(cfg, dict):
            cfg = parse_structured(self.Config, cfg)
        self.cfg = cfg

        geo_cfg = dict(cfg.geometry)
        if cfg.geometry_convert_from and "geometry_convert_from" not in geo_cfg:
            geo_cfg["geometry_convert_from"] = cfg.geometry_convert_from
        self.geometry = find(cfg.geometry_type)(geo_cfg)
        self.material = (
            find(cfg.material_type)(cfg.material) if cfg.material_type else None
        )
        self.background = (
            find(cfg.background_type)(cfg.background) if cfg.background_type else None
        )
        self.renderer = find(cfg.renderer_type)(
            cfg.renderer,
            geometry=self.geometry,
            material=self.material,
            background=self.background,
        )
        self.guidance = (
            find(cfg.guidance_type)(cfg.guidance) if cfg.guidance_type else None
        )
        self.prompt_processor = (
            find(cfg.prompt_processor_type)(cfg.prompt_processor)
            if cfg.prompt_processor_type
            else None
        )
        self.prompt_utils = self.prompt_processor() if self.prompt_processor else None
        self._train_jit: Dict[Any, Any] = {}
        self._eval_jit: Dict[Any, Any] = {}
        self._capacity: Optional[int] = None  # adaptive pair capacity
        self._pair_log: list = []
        self._retrace_count: int = 0  # cumulative capacity changes (each
        # one recompiles the step -- PERF.md documents 30-minute-class
        # tunnel compiles at flagship scale, so thrash must be visible)
        self._last_shrink_step: int = -(10**9)
        self._submeshes: Dict[int, Any] = {}  # gcd sub-meshes, NOT jit fns
        self._submesh_warned: set = set()
        # data-parallel camera sharding: set by the Trainer via set_mesh()
        # when more than one device is available (the reference assumes
        # Lightning DDP drives this from launch.py; SURVEY.md section 2.4)
        self.mesh = None
        self._dp_axis = "data"

        opt = cfg.optimizer if isinstance(cfg.optimizer, dict) else {}
        self.extra_lr = float(
            (opt.get("args") or {}).get("lr")
            or ((opt.get("params") or {}).get("background") or {}).get("lr")
            or 1e-3
        )

    # -- state --------------------------------------------------------------
    def init_state(self, seed: int = 0) -> SystemState:
        gauss = self.geometry.init_state(seed)
        key = jax.random.PRNGKey(seed)
        extra: Dict[str, Any] = {}
        if self.background is not None and hasattr(self.background, "init_params"):
            params = self.background.init_params(key)
            if params:
                extra["background"] = params
        return SystemState(
            gauss=gauss, extra_params=extra, extra_opt=init_adam(extra)
        )

    # -- scheduled scalars ---------------------------------------------------
    def loss_lambda(self, sched, name: str):
        return sched["lambdas"].get(name, jnp.float32(0.0))

    def tv_trio_losses(self, out, sched, logs, loss=None):
        """rgb/depth/normal total-variation regularizers under the
        reference's lambda names (sugar_static.py:315-331); shared by the
        sugar stages and the 4dgen systems."""
        import jax.numpy as jnp

        from ..utils.loss import tv_loss

        total = jnp.float32(0.0) if loss is None else loss
        for lam, key_name, log_name in (
            ("lambda_rgb_tv", "comp_rgb", "rgb_tv"),
            ("lambda_depth_tv", "comp_depth", "depth_tv"),
            ("lambda_normal_tv", "comp_normal", "normal_tv"),
        ):
            if self.has_loss(lam) and key_name in out:
                v = tv_loss(out[key_name])
                logs[f"train/loss_{log_name}"] = v
                total = total + v * self.loss_lambda(sched, lam)
        return total

    def has_loss(self, name: str) -> bool:
        """Static check: could this lambda ever be > 0 (avoids dead graph)."""
        from ..utils.config import C_max

        value = self.cfg.loss.get(name, 0.0)
        try:
            return C_max(value) > 0
        except TypeError:
            return False

    def sched_scalars(self, step: int) -> Dict[str, Any]:
        lambdas = {
            name: jnp.float32(C(value, 0, step))
            for name, value in self.cfg.loss.items()
            if isinstance(value, (int, float, list, tuple))
        }
        sched: Dict[str, Any] = {
            "lrs": self.geometry.lr_tree(step),
            "extra_lr": jnp.float32(self.extra_lr),
            "color_clip": jnp.float32(self.geometry.color_clip(step)),
            "lambdas": lambdas,
            "step": jnp.float32(step),
        }
        if self.guidance is not None and hasattr(self.guidance, "sched_scalars"):
            sched["guidance"] = self.guidance.sched_scalars(step)
        if self.material is not None and hasattr(
            self.material.cfg, "ambient_only_steps"
        ):
            sched["ambient_only"] = jnp.asarray(
                step < self.material.cfg.ambient_only_steps
            )
        return sched

    # -- losses (overridden per system) -------------------------------------
    def compute_loss(self, out, gauss, extra_params, batch, sched, key):
        raise NotImplementedError

    # -- forward ------------------------------------------------------------
    def render_batch(
        self, gauss, extra_params, batch, height, width, key, sched, training, vs_dummy=None
    ):
        b = dict(batch)
        b["height"], b["width"] = height, width
        return self.renderer.batch_forward(
            gauss,
            b,
            bg_params=extra_params.get("background") if extra_params else None,
            key=key,
            ambient_only=sched.get("ambient_only") if sched else None,
            training=training,
            color_clip=sched["color_clip"] if sched else jnp.float32(1e9),
            means2d_offset=vs_dummy,
        )

    # -- train step ----------------------------------------------------------
    def _train_step_impl(self, height, width, bs, state, batch, key, sched):
        cap = state.gauss.capacity
        vs_dummy = jnp.zeros((bs, cap, 2))

        def loss_fn(gp, ep, vs):
            gs = state.gauss.replace(params=gp)
            k_render, k_loss = jax.random.split(key)
            out = self.render_batch(
                gs, ep, batch, height, width, k_render, sched, True, vs
            )
            total, logs = self.compute_loss(out, gs, ep, batch, sched, k_loss)
            return total, (out, logs)

        (g_gauss, g_extra, g_vs), (out, logs) = jax.grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(state.gauss.params, state.extra_params, vs_dummy)

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

        vs_grad_norm = jnp.linalg.norm(g_vs, axis=-1)  # (B, CAP), NDC units
        gauss = gf.accumulate_stats(
            gauss,
            out["radii"].astype(jnp.float32),
            out["visibility_filter"],
            vs_grad_norm,
        )

        logs = dict(logs)
        logs["n_dropped_pairs"] = jnp.sum(out["n_dropped"])
        # per-view pair DEMAND (incl. dropped), maxed over views: the signal
        # for adaptive capacity sizing
        logs["n_pairs_max"] = jnp.max(out["n_pairs"] + out["n_dropped"])
        return SystemState(gauss=gauss, extra_params=new_extra, extra_opt=new_opt), logs

    # -- adaptive pair capacity ----------------------------------------------
    _ADAPT_EVERY = 50  # steps between host syncs of the pair stats
    _BUCKET = 256 * 1024  # capacity quantum (multiple of every kernel tile)
    _SHRINK_COOLDOWN = 8 * _ADAPT_EVERY  # min steps between capacity shrinks

    def _pair_capacity(self) -> Optional[int]:
        rcfg = getattr(self.renderer, "cfg", None)
        if rcfg is None or not getattr(rcfg, "adaptive_max_pairs", False):
            return None
        if self._capacity is None:
            self._capacity = int(rcfg.max_pairs)
        return self._capacity

    def _adapt_pair_capacity(self, step: int) -> None:
        """Bucketed right-sizing of the static pair capacity: every
        pair-stage op (expand/sorts/gathers/blend) runs at this size, so
        fitting it to the live scene is a direct throughput win.  Stats are
        synced to the host once per _ADAPT_EVERY steps (per-step syncs cost
        100-600 ms tunnel latency -- PERF.md); grow on any drop, shrink with
        hysteresis (observed peak * 1.4 two buckets below capacity)."""
        if not self._pair_log or step % self._ADAPT_EVERY != 0:
            return
        stats = jax.device_get(self._pair_log)  # ONE host sync
        self._pair_log.clear()
        demand = max(int(s[0]) for s in stats)  # peak per-view pair demand
        dropped = max(int(s[1]) for s in stats)
        rcfg = self.renderer.cfg
        cap = self._capacity

        def bucket(x):
            b = -(-x // self._BUCKET) * self._BUCKET
            return max(min(b, int(rcfg.max_pairs)), int(rcfg.min_pairs))

        if dropped > 0:
            new_cap = bucket(max(int(cap * 3 // 2), int(demand * 1.2)))
        else:
            want = bucket(int(demand * 1.4))
            new_cap = want if want <= cap - 2 * self._BUCKET else cap
            # shrink cooldown: an oscillating demand trace (densify spikes
            # every few hundred steps) would otherwise retrace the step each
            # _ADAPT_EVERY -- growth stays immediate (drops lose pairs), but
            # a shrink may only follow another shrink after
            # _SHRINK_COOLDOWN steps
            if new_cap < cap and step - self._last_shrink_step < self._SHRINK_COOLDOWN:
                new_cap = cap
        if new_cap != cap:
            if new_cap < cap:
                self._last_shrink_step = step
            self._retrace_count += 1
            print(
                f"[system] pair capacity {cap} -> {new_cap} "
                f"(demand {demand}, dropped {dropped}, "
                f"retrace #{self._retrace_count})",
                flush=True,
            )
            self._capacity = new_cap

    def set_mesh(self, mesh, axis: str = "data") -> None:
        """Route training through the camera-sharded dp step on `mesh`.

        Called by the Trainer when the host has multiple devices (or the
        config requests an explicit device count).  The reference reaches
        multi-GPU through Lightning DDP configured in launch.py
        (reference README.md:41, rank-aware data at reference
        data/image.py:23,58); here the same surface engages shard_map over a
        jax Mesh.  A 1-device mesh is valid (same code path, no collectives
        cost) and is how the shard_map x Pallas x Adam combination is
        validated on a single real chip.

        When a step's camera batch is not divisible by the mesh size, the
        step runs on a sub-mesh of gcd(batch, n_devices) devices (DDP-style
        divisibility, degrading gracefully instead of erroring)."""
        self.mesh = mesh
        self._dp_axis = axis
        self._train_jit.clear()
        self._submeshes.clear()

    def _mesh_for_batch(self, bs: int):
        """The largest sub-mesh whose size divides the camera batch."""
        import math

        n = self.mesh.shape[self._dp_axis]
        use = math.gcd(bs, n)
        if use == n:
            return self.mesh
        if use not in self._submeshes:
            from jax.sharding import Mesh

            devs = np.asarray(self.mesh.devices).reshape(-1)[:use]
            self._submeshes[use] = Mesh(devs, (self._dp_axis,))
        if (bs, use) not in self._submesh_warned:
            # surface the idle devices: bs=4 on 8 devices silently runs 4
            self._submesh_warned.add((bs, use))
            print(
                f"[system] camera batch {bs} not divisible by mesh size {n}: "
                f"stepping on a {use}-device sub-mesh ({n - use} idle)",
                flush=True,
            )
        return self._submeshes[use]

    def _dp_train_jit(self, sig, mesh):
        """Cached dp train step for (height, width, global_bs, capacity)."""
        key = ("dp", mesh.shape[self._dp_axis]) + sig
        if key not in self._train_jit:
            from ..parallel.data_parallel import make_dp_train_step

            height, width, bs, _ = sig
            self._train_jit[key] = make_dp_train_step(
                self, mesh, height, width, bs, axis=self._dp_axis
            )
        return self._train_jit[key]

    def train_step(self, state, batch, step: int, key):
        dev_batch = to_device_batch(batch)
        sched = self.sched_scalars(step)
        bs = int(np.asarray(batch["c2w"]).shape[0])
        height, width = int(batch["height"]), int(batch["width"])
        capacity = self._pair_capacity()
        self.renderer.max_pairs_override = capacity
        sig = (height, width, bs, capacity)
        k_step, k_struct = jax.random.split(key)
        if self.mesh is not None:
            from ..parallel.data_parallel import shard_batch

            mesh = self._mesh_for_batch(bs)
            step_fn = self._dp_train_jit(sig, mesh)
            dev_batch = shard_batch(mesh, dev_batch, self._dp_axis, batch_size=bs)
            state, logs = step_fn(state, dev_batch, k_step, sched)
        else:
            if sig not in self._train_jit:
                self._train_jit[sig] = jax.jit(
                    partial(self._train_step_impl, *sig[:3])
                )
            state, logs = self._train_jit[sig](state, dev_batch, k_step, sched)
        if capacity is not None:
            self._pair_log.append(
                (logs["n_pairs_max"], logs["n_dropped_pairs"])
            )
            self._adapt_pair_capacity(step)
        new_gauss, changed = self.geometry.update_states(state.gauss, step, k_struct)
        if changed:
            state = state.replace(gauss=new_gauss)
        return state, logs

    # -- eval ---------------------------------------------------------------
    def _eval_impl(self, height, width, state, batch):
        return self.render_batch(
            state.gauss, state.extra_params, batch, height, width, None, None, False
        )

    def render_views(self, state, views):
        outs = []
        for view in views:
            height, width = int(view["height"]), int(view["width"])
            sig = (height, width)
            if sig not in self._eval_jit:
                self._eval_jit[sig] = jax.jit(partial(self._eval_impl, *sig))
            out = self._eval_jit[sig](state, to_device_batch(view))
            outs.append(jax.device_get(out))
        return outs

    # -- saving --------------------------------------------------------------
    def save_validation_images(self, out_dir, state, views, step, prefix=""):
        outs = self.render_views(state, views)
        for view, out in zip(views, outs):
            imgs = [out["comp_rgb"][0]]
            if "comp_normal" in out:
                imgs.append(out["comp_normal"][0])
            save_image_grid(
                os.path.join(out_dir, f"it{step}-{prefix}{view['index']}.png"), imgs
            )
        return outs
