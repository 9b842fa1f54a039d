"""Fixed-capacity Gaussian field: the TPU-native re-design of the reference's
`GaussianBaseModel` (reference geometry/gaussian_base.py:187-869).

The reference resizes parameter tensors and torch Adam state freely during
adaptive density control.  Under XLA every shape is compiled, so here the field
lives in arrays of static capacity `CAP` with an `alive` mask and a live
count; clone/split/prune become masked scatters into free slots and Adam-moment
rows are zeroed in the same op (SURVEY.md section 7, design delta 1).

Structural ops are pure jitted functions `state -> state`; the interval gating
(every `densification_interval` steps etc., reference gaussian_base.py:853-869)
stays host-side so the hot training step never traces them.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops import knn as knn_ops
from ..ops import quaternion
from ..ops.gaussian_math import inverse_sigmoid
from ..ops.sh import num_sh_bases, rgb_to_sh
from ..utils.config import C
from ..utils.registry import register
from . import ply_io
from .optim import AdamState, adam_update, init_adam, zero_moments_at, zero_moments_field

# ---------------------------------------------------------------------------
# State pytrees
# ---------------------------------------------------------------------------


@struct.dataclass
class GaussianParams:
    """Learnable per-Gaussian parameters, all (CAP, ...) float32.

    Mirrors the reference's parameter set _xyz/_features_dc/_features_rest/
    _scaling/_rotation/_opacity[/_normal] (geometry/gaussian_base.py:256-266).
    """

    xyz: jnp.ndarray  # (CAP, 3)
    features_dc: jnp.ndarray  # (CAP, 1, 3)
    features_rest: jnp.ndarray  # (CAP, K-1, 3)
    scaling: jnp.ndarray  # (CAP, 3) log-scale
    rotation: jnp.ndarray  # (CAP, 4) wxyz, unnormalized
    opacity: jnp.ndarray  # (CAP, 1) logit
    normal: Optional[jnp.ndarray] = None  # (CAP, 3) if pred_normal


@struct.dataclass
class GaussianState:
    params: GaussianParams
    adam: AdamState
    alive: jnp.ndarray  # (CAP,) bool
    max_radii2d: jnp.ndarray  # (CAP,) f32
    xyz_grad_accum: jnp.ndarray  # (CAP,) f32 (accumulated NDC grad norms)
    denom: jnp.ndarray  # (CAP,) f32

    @property
    def capacity(self) -> int:
        return self.alive.shape[0]

    @property
    def n_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class GaussianFieldConfig:
    """Mirrors reference GaussianBaseModel.Config (gaussian_base.py:189-230)."""

    max_num: int = 500000
    capacity: Optional[int] = None  # static array capacity; default ~1.3*max_num
    sh_degree: int = 0
    position_lr: Any = 0.001
    feature_lr: Any = 0.01
    opacity_lr: Any = 0.05
    scaling_lr: Any = 0.005
    rotation_lr: Any = 0.005
    pred_normal: bool = False
    normal_lr: Any = 0.001
    # unused by the reference optimizer but present in its config
    scale_lr: Any = 0.003

    densification_interval: int = 50
    prune_interval: int = 50
    opacity_reset_interval: int = 100000
    densify_from_iter: int = 100
    prune_from_iter: int = 100
    densify_until_iter: int = 2000
    prune_until_iter: int = 2000
    densify_grad_threshold: Any = 0.01
    min_opac_prune: Any = 0.005
    split_thresh: Any = 0.02
    radii2d_thresh: Any = 1000

    sphere: bool = False
    prune_big_points: bool = False
    color_clip: Any = 2.0

    geometry_convert_from: str = ""
    load_ply_only_vertex: bool = False
    load_vertex_only_position: bool = False
    init_num_pts: int = 100
    pc_init_radius: float = 0.8
    opacity_init: float = 0.1

    sugar_prune_at: Any = None
    sugar_prune_threshold: float = 0.5

    def resolved_capacity(self) -> int:
        if self.capacity is not None:
            return int(self.capacity)
        # headroom for the transient overshoot the reference allows before its
        # cap-prune kicks in (gaussian_base.py:836-841)
        return int(self.max_num * 1.3) + 1024


# ---------------------------------------------------------------------------
# Activations (reference gaussian_base.py:233-248, 371-416)
# ---------------------------------------------------------------------------


def get_scaling(params: GaussianParams, sphere: bool = False) -> jnp.ndarray:
    if sphere:
        mean = jnp.mean(params.scaling, axis=-1, keepdims=True)
        return jnp.exp(jnp.broadcast_to(mean, params.scaling.shape))
    return jnp.exp(params.scaling)


def get_rotation(params: GaussianParams) -> jnp.ndarray:
    return quaternion.normalize(params.rotation)


def get_opacity(params: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(params.opacity)


def get_features(params: GaussianParams, color_clip: float = np.inf) -> jnp.ndarray:
    """(CAP, K, 3) SH coefficients; only f_dc is clipped by the scheduled
    color_clip (reference gaussian_base.py:392-400 -- a documented quirk)."""
    dc = jnp.clip(params.features_dc, -color_clip, color_clip)
    return jnp.concatenate([dc, params.features_rest], axis=1)


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _pad_cap(arr: np.ndarray, cap: int) -> np.ndarray:
    n = arr.shape[0]
    if n > cap:
        raise ValueError(f"init point count {n} exceeds capacity {cap}")
    return np.concatenate([arr, np.zeros((cap - n,) + arr.shape[1:], arr.dtype)], 0)


def params_from_pcd(
    points: np.ndarray,
    colors: np.ndarray,
    cfg: GaussianFieldConfig,
) -> Tuple[GaussianParams, np.ndarray]:
    """create_from_pcd semantics (reference gaussian_base.py:418-468):
    scales from log(sqrt(mean 3-NN sq dist)), identity rotations, constant
    initial opacity, colors -> SH DC."""
    cap = cfg.resolved_capacity()
    n = points.shape[0]
    k_rest = num_sh_bases(cfg.sh_degree) - 1

    dist2 = np.asarray(knn_ops.mean_knn_sq_dist(jnp.asarray(points, jnp.float32)))
    dist2 = np.maximum(dist2, 1e-7)
    scales = np.log(np.sqrt(dist2))[:, None].repeat(3, axis=1).astype(np.float32)

    rots = np.zeros((n, 4), np.float32)
    rots[:, 0] = 1.0
    opacity = np.full((n, 1), float(cfg.opacity_init), np.float32)
    opacity = np.log(opacity / (1.0 - opacity))

    f_dc = np.asarray(rgb_to_sh(jnp.asarray(colors, jnp.float32)))[:, None, :]
    f_rest = np.zeros((n, k_rest, 3), np.float32)

    params = GaussianParams(
        xyz=jnp.asarray(_pad_cap(points.astype(np.float32), cap)),
        features_dc=jnp.asarray(_pad_cap(f_dc, cap)),
        features_rest=jnp.asarray(_pad_cap(f_rest, cap)),
        scaling=jnp.asarray(_pad_cap(scales, cap)),
        rotation=jnp.asarray(_pad_cap(rots, cap)),
        opacity=jnp.asarray(_pad_cap(opacity, cap)),
        normal=jnp.asarray(_pad_cap(np.zeros((n, 3), np.float32), cap))
        if cfg.pred_normal
        else None,
    )
    alive = np.zeros(cap, bool)
    alive[:n] = True
    return params, alive


def random_sphere_pcd(cfg: GaussianFieldConfig, seed: int = 0):
    """Random-point init inside a sphere (reference gaussian_base.py:349-369)."""
    rng = np.random.default_rng(seed)
    n = cfg.init_num_pts
    phis = rng.random(n) * 2 * np.pi
    costheta = rng.random(n) * 2 - 1
    thetas = np.arccos(costheta)
    mu = rng.random(n)
    radius = cfg.pc_init_radius * np.cbrt(mu)
    xyz = np.stack(
        [
            radius * np.sin(thetas) * np.cos(phis),
            radius * np.sin(thetas) * np.sin(phis),
            radius * np.cos(thetas),
        ],
        axis=1,
    ).astype(np.float32)
    shs = rng.random((n, 3)).astype(np.float32) / 255.0
    colors = shs * 0.28209479177387814 + 0.5
    return xyz, colors


def prompt_guidance_pcd(kind: str, prompt: str, cfg, seed: int):
    """shap-e:/lrm: prompt-based geometry init (reference
    gaussian_base.py:270-296).  If a '{kind}-guidance' component is
    registered (a shap-e or OpenLRM port with local weights), call it for
    (xyz, colors); otherwise fall back to a DETERMINISTIC prompt-seeded
    sphere cloud so the config surface works without those weights (none
    exist in this environment)."""
    import zlib

    from ..utils.registry import registry

    name = f"{kind}-guidance"
    if name in registry:
        guidance = registry[name]({})
        xyz, colors = guidance(prompt)
        return np.asarray(xyz, np.float32), np.asarray(colors, np.float32)
    prompt_seed = zlib.crc32(prompt.encode("utf-8")) ^ seed
    return random_sphere_pcd(cfg, prompt_seed)


def init_state(cfg: GaussianFieldConfig, seed: int = 0) -> GaussianState:
    """Build the initial field state per geometry_convert_from
    (reference gaussian_base.py:270-369: shap-e:/lrm: prompt, .ply load,
    .ckpt warm start, or random sphere)."""
    src = cfg.geometry_convert_from
    if src and src.startswith(("shap-e:", "lrm:")):
        kind, _, prompt = src.partition(":")
        xyz, colors = prompt_guidance_pcd(kind, prompt, cfg, seed)
        params, alive = params_from_pcd(xyz, colors, cfg)
        cap = cfg.resolved_capacity()
        return GaussianState(
            params=params,
            adam=init_adam(params),
            alive=jnp.asarray(alive),
            max_radii2d=jnp.zeros(cap, jnp.float32),
            xyz_grad_accum=jnp.zeros(cap, jnp.float32),
            denom=jnp.zeros(cap, jnp.float32),
        )
    if src and (src.endswith(".ckpt.npz") or src.endswith(".ckpt")):
        # warm-start from a saved training state (reference supports .ckpt
        # warm starts at gaussian_base.py:297-347); our checkpoints hold the
        # full static-capacity state, so this is a straight load + re-init of
        # the optimizer moments
        from ..utils.ckpt import load_checkpoint

        state, _ = load_checkpoint(src)
        gauss = state.gauss if hasattr(state, "gauss") else state
        import jax.numpy as _jnp

        return GaussianState(
            params=jax.tree_util.tree_map(_jnp.asarray, gauss.params),
            adam=init_adam(gauss.params),
            alive=_jnp.asarray(gauss.alive),
            max_radii2d=_jnp.zeros(gauss.alive.shape[0], _jnp.float32),
            xyz_grad_accum=_jnp.zeros(gauss.alive.shape[0], _jnp.float32),
            denom=_jnp.zeros(gauss.alive.shape[0], _jnp.float32),
        )
    if src and src.endswith(".ply"):
        import os

        if not os.path.exists(src):
            raise FileNotFoundError(src)
        if cfg.load_ply_only_vertex:
            # plain point-cloud PLY (x/y/z [+ red/green/blue]), reference
            # gaussian_base.py:319-344 -- including its hard-coded axis
            # permutation quirk ("only for experiment, should be removed
            # later", :325-328; preserved for parity, documented in SURVEY)
            cols = ply_io.read_ply_table(src)
            positions = np.stack(
                [cols["x"], cols["y"], cols["z"]], axis=1
            ).astype(np.float32)
            trans = np.array(
                [[0, 1, 0], [0, 0, 1], [1, 0, 0]], np.float32
            )
            positions = positions @ trans
            if "red" in cols and not cfg.load_vertex_only_position:
                colors = (
                    np.stack(
                        [cols["red"], cols["green"], cols["blue"]], axis=1
                    ).astype(np.float32)
                    / 255.0
                )
            else:
                rng = np.random.default_rng(seed)
                shs = rng.random((positions.shape[0], 3)).astype(np.float32) / 255.0
                colors = shs * 0.28209479177387814 + 0.5
            params, alive = params_from_pcd(positions, colors, cfg)
            return GaussianState(
                params=params,
                adam=init_adam(params),
                alive=jnp.asarray(alive),
                max_radii2d=jnp.zeros(cfg.resolved_capacity(), jnp.float32),
                xyz_grad_accum=jnp.zeros(cfg.resolved_capacity(), jnp.float32),
                denom=jnp.zeros(cfg.resolved_capacity(), jnp.float32),
            )
        raw = ply_io.load_gaussian_ply(src, cfg.sh_degree)
        cap = cfg.resolved_capacity()
        n = raw["xyz"].shape[0]
        params = GaussianParams(
            xyz=jnp.asarray(_pad_cap(raw["xyz"], cap)),
            features_dc=jnp.asarray(_pad_cap(raw["features_dc"], cap)),
            features_rest=jnp.asarray(_pad_cap(raw["features_rest"], cap)),
            scaling=jnp.asarray(_pad_cap(raw["scaling"], cap)),
            rotation=jnp.asarray(_pad_cap(raw["rotation"], cap)),
            opacity=jnp.asarray(_pad_cap(raw["opacity"], cap)),
            normal=jnp.asarray(np.zeros((cap, 3), np.float32))
            if cfg.pred_normal
            else None,
        )
        alive = np.zeros(cap, bool)
        alive[:n] = True
    else:
        xyz, colors = random_sphere_pcd(cfg, seed)
        params, alive = params_from_pcd(xyz, colors, cfg)
    cap = cfg.resolved_capacity()
    return GaussianState(
        params=params,
        adam=init_adam(params),
        alive=jnp.asarray(alive),
        max_radii2d=jnp.zeros(cap, jnp.float32),
        xyz_grad_accum=jnp.zeros(cap, jnp.float32),
        denom=jnp.zeros(cap, jnp.float32),
    )


# ---------------------------------------------------------------------------
# Learning rates (reference gaussian_base.py:470-572)
# ---------------------------------------------------------------------------


def lr_tree(cfg: GaussianFieldConfig, step: int) -> GaussianParams:
    """Per-field learning rates at `step`, exp-interpolated like the
    reference's update_learning_rate.  f_rest runs at feature_lr/20."""

    def c(v):
        return jnp.asarray(C(v, 0, step, interpolation="exp"), jnp.float32)

    feat = C(cfg.feature_lr, 0, step, interpolation="exp")
    return GaussianParams(
        xyz=c(cfg.position_lr),
        features_dc=jnp.asarray(feat, jnp.float32),
        features_rest=jnp.asarray(feat / 20.0, jnp.float32),
        scaling=c(cfg.scaling_lr),
        rotation=c(cfg.rotation_lr),
        opacity=c(cfg.opacity_lr),
        normal=c(cfg.normal_lr) if cfg.pred_normal else None,
    )


def apply_gradients(
    state: GaussianState, grads: GaussianParams, lrs: GaussianParams
) -> GaussianState:
    """Adam step over all parameter fields, masked to alive rows so dead slots
    never drift (their reference counterparts do not exist at all)."""
    mask = state.alive
    masked = jax.tree_util.tree_map(
        lambda g: jnp.where(mask.reshape((-1,) + (1,) * (g.ndim - 1)), g, 0.0), grads
    )
    new_params, new_adam = adam_update(state.params, masked, state.adam, lrs)
    # keep dead rows bit-identical (adam eps drift guard)
    new_params = jax.tree_util.tree_map(
        lambda new, old: jnp.where(
            mask.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
        ),
        new_params,
        state.params,
    )
    return state.replace(params=new_params, adam=new_adam)


# ---------------------------------------------------------------------------
# Densification statistics (reference gaussian_base.py:815-819, 843-851)
# ---------------------------------------------------------------------------


@jax.jit
def accumulate_stats(
    state: GaussianState,
    radii: jnp.ndarray,  # (B, CAP) f32 screen radii per view
    visibility: jnp.ndarray,  # (B, CAP) bool
    vs_grad_norm: jnp.ndarray,  # (B, CAP) f32  |dL/d means2d_ndc|
) -> GaussianState:
    return state.replace(
        max_radii2d=jnp.maximum(state.max_radii2d, jnp.max(radii, axis=0)),
        xyz_grad_accum=state.xyz_grad_accum
        + jnp.sum(jnp.where(visibility, vs_grad_norm, 0.0), axis=0),
        denom=state.denom + jnp.sum(visibility.astype(jnp.float32), axis=0),
    )


# ---------------------------------------------------------------------------
# Structural ops (masked-scatter equivalents of clone/split/prune)
# ---------------------------------------------------------------------------


def _free_slot_targets(alive: jnp.ndarray, want: jnp.ndarray) -> jnp.ndarray:
    """For each row i with want[i], a distinct free slot index; CAP (=len)
    when out of space so scatters with mode='drop' discard the overflow."""
    cap = alive.shape[0]
    free = jnp.logical_not(alive)
    free_slots = jnp.nonzero(free, size=cap, fill_value=cap)[0]
    n_free = jnp.sum(free.astype(jnp.int32))
    rank = jnp.cumsum(want.astype(jnp.int32)) - 1
    ok = want & (rank < n_free)
    return jnp.where(ok, free_slots[jnp.clip(rank, 0, cap - 1)], cap)


def _scatter_rows(params: GaussianParams, source_vals: GaussianParams, targets):
    """Write source_vals[i] into row targets[i] of every leaf (drop overflow)."""
    return jax.tree_util.tree_map(
        lambda leaf, val: leaf.at[targets].set(val, mode="drop"), params, source_vals
    )


def _reset_stats(state: GaussianState) -> GaussianState:
    """densification_postfix resets accumulators for every row
    (reference gaussian_base.py:699-703)."""
    cap = state.capacity
    return state.replace(
        max_radii2d=jnp.zeros(cap, jnp.float32),
        xyz_grad_accum=jnp.zeros(cap, jnp.float32),
        denom=jnp.zeros(cap, jnp.float32),
    )


@partial(jax.jit, static_argnames=("prune_big_points",))
def prune_op(
    state: GaussianState,
    min_opacity: jnp.ndarray,
    prune_big_points: bool = False,
) -> GaussianState:
    """Opacity (and optionally big-point) prune (reference
    gaussian_base.py:806-813).  The reference's max_screen_size argument is
    ignored there too; big-point pruning keys off mean radii."""
    opac = get_opacity(state.params)[:, 0]
    mask = opac < min_opacity
    if prune_big_points:
        alive_f = state.alive.astype(jnp.float32)
        mean_r = jnp.sum(state.max_radii2d * alive_f) / jnp.maximum(
            jnp.sum(alive_f), 1.0
        )
        mask = mask | (state.max_radii2d > mean_r * 3.0)
    return state.replace(alive=state.alive & jnp.logical_not(mask))


@jax.jit
def reset_opacity_op(state: GaussianState) -> GaussianState:
    """opacity <- logit(0.9 * sigmoid(opacity)); zero opacity Adam moments
    (reference gaussian_base.py:574-578)."""
    new_op = inverse_sigmoid(get_opacity(state.params) * 0.9)
    params = state.params.replace(opacity=new_op)
    return state.replace(params=params, adam=zero_moments_field(state.adam, "opacity"))


@jax.jit
def sugar_prune_op(state: GaussianState, threshold: jnp.ndarray) -> GaussianState:
    """Hard opacity prune at the SuGaR handoff step
    (reference gaussian_base.py:824-828)."""
    keep = get_opacity(state.params)[:, 0] >= threshold
    return state.replace(alive=state.alive & keep)


@jax.jit
def cap_prune_op(state: GaussianState, key: jnp.ndarray, max_num: jnp.ndarray):
    """Random prune down to max_num points when over budget
    (reference gaussian_base.py:836-841)."""
    cap = state.capacity
    scores = jax.random.uniform(key, (cap,))
    scores = jnp.where(state.alive, scores, -1.0)
    order = jnp.argsort(-scores)  # alive rows first, random order
    ranks = jnp.zeros(cap, jnp.int32).at[order].set(jnp.arange(cap, dtype=jnp.int32))
    keep = state.alive & (ranks < max_num)
    return state.replace(alive=keep)


@partial(jax.jit, static_argnames=("sphere",))
def densify_op(
    state: GaussianState,
    key: jnp.ndarray,
    grad_threshold: jnp.ndarray,
    split_thresh: jnp.ndarray,
    sphere: bool = False,
) -> GaussianState:
    """Clone + split (reference gaussian_base.py:678-793) as masked scatters.

    Matches the reference quirks deliberately: clone first, split decided on
    pre-clone rows only (clones get zero grads there via padding); split
    children shrink scales by 1/(0.8*N) with N=2; parents are replaced
    in-place by child 1 (the reference appends 2 children and prunes the
    parent -- net effect identical with one fewer free slot consumed).
    """
    params = state.params
    cap = state.capacity
    grads = jnp.where(state.denom > 0, state.xyz_grad_accum / state.denom, 0.0)
    scal = get_scaling(params, sphere)
    scale_norm = jnp.linalg.norm(scal, axis=-1)

    hot = state.alive & (grads >= grad_threshold)
    clone_mask = hot & (scale_norm <= split_thresh)
    split_mask = hot & (scale_norm > split_thresh)

    # ---- clone: copy row into a free slot --------------------------------
    ctarget = _free_slot_targets(state.alive, clone_mask)
    params = _scatter_rows(params, state.params, ctarget)
    alive = state.alive.at[ctarget].set(True, mode="drop")
    adam = zero_moments_at(state.adam, ctarget)

    # ---- split: parent -> two resampled children -------------------------
    n_children = 2
    rot = quaternion.to_rotation_matrix(params.rotation)  # normalized inside
    k1, k2, k3 = jax.random.split(key, 3)
    eps1 = jax.random.normal(k1, (cap, 3)) * scal
    eps2 = jax.random.normal(k2, (cap, 3)) * scal
    child1_xyz = params.xyz + jnp.einsum("nij,nj->ni", rot, eps1)
    child2_xyz = params.xyz + jnp.einsum("nij,nj->ni", rot, eps2)
    child_scaling = jnp.log(scal / (0.8 * n_children))

    starget = _free_slot_targets(alive, split_mask)
    # spacetime fields resample the split children's temporal RBF center
    # uniformly (reference spacetime_gaussian.py:807-808)
    trbf_child = None
    if getattr(params, "trbf_center", None) is not None:
        trbf_child = jax.random.uniform(k3, params.trbf_center.shape)
    # child 2 first (reads parent rows before they are overwritten)
    child2_vals = params.replace(xyz=child2_xyz, scaling=child_scaling)
    if trbf_child is not None:
        child2_vals = child2_vals.replace(trbf_center=trbf_child)
    params = _scatter_rows(params, child2_vals, starget)
    alive = alive.at[starget].set(True, mode="drop")
    # child 1 replaces the parent row in place
    smask3 = split_mask[:, None]
    params = params.replace(
        xyz=jnp.where(smask3, child1_xyz, params.xyz),
        scaling=jnp.where(smask3, child_scaling, params.scaling),
    )
    if trbf_child is not None:
        params = params.replace(
            trbf_center=jnp.where(smask3, trbf_child, params.trbf_center)
        )
    # the reference's appended children start with zero Adam moments
    adam = zero_moments_at(adam, starget)
    adam = zero_moments_at(adam, jnp.where(split_mask, jnp.arange(cap), cap))

    return _reset_stats(state.replace(params=params, alive=alive, adam=adam))


# ---------------------------------------------------------------------------
# Host-side orchestration
# ---------------------------------------------------------------------------


@register("gaussian-splatting")
class GaussianField:  # also registered as "gaussian-splatting-io" below
    """Host-side wrapper: owns the config, schedules structural updates, and
    provides I/O.  All device state lives in `GaussianState` pytrees."""

    Config = GaussianFieldConfig

    def __init__(self, cfg: Optional[GaussianFieldConfig] = None, **kwargs):
        if cfg is None:
            cfg = GaussianFieldConfig(**kwargs)
        elif isinstance(cfg, dict):
            from ..utils.config import parse_structured

            cfg = parse_structured(GaussianFieldConfig, cfg)
        self.cfg = cfg
        self.active_sh_degree = 0
        if (
            cfg.geometry_convert_from.endswith(".ply")
            and not cfg.load_ply_only_vertex
        ) or cfg.geometry_convert_from.endswith((".ckpt", ".ckpt.npz")):
            # warm starts activate all SH bands (reference
            # gaussian_io.py:171-172; a ckpt resume carries trained
            # features_rest that sh_degree=0 would silently drop).  A
            # vertex-only point cloud starts from degree 0 like the random
            # init (reference create_from_pcd path).
            self.active_sh_degree = cfg.sh_degree

    # -- state ------------------------------------------------------------
    def init_state(self, seed: int = 0) -> GaussianState:
        return init_state(self.cfg, seed)

    def lr_tree(self, step: int) -> GaussianParams:
        return lr_tree(self.cfg, step)

    def color_clip(self, step: int) -> float:
        return float(C(self.cfg.color_clip, 0, step))

    # -- structural updates ----------------------------------------------
    def update_states(
        self, state: GaussianState, iteration: int, key: jnp.ndarray
    ) -> Tuple[GaussianState, bool]:
        """Interval-gated adaptive density control; returns (state, changed).
        Mirrors reference update_states (gaussian_base.py:821-869) with the
        cap check evaluated at structural steps (growth only happens then)."""
        cfg = self.cfg
        if cfg.sugar_prune_at is not None and iteration == cfg.sugar_prune_at:
            return (
                sugar_prune_op(state, jnp.float32(cfg.sugar_prune_threshold)),
                True,
            )

        prune_step = (
            cfg.prune_from_iter < iteration < cfg.prune_until_iter
            and iteration % cfg.prune_interval == 0
        )
        densify_step = (
            cfg.densify_from_iter < iteration < cfg.densify_until_iter
            and iteration % cfg.densification_interval == 0
        )
        changed = False
        if prune_step or densify_step:
            if int(state.n_alive) >= cfg.max_num + 100:
                key, sub = jax.random.split(key)
                return cap_prune_op(state, sub, jnp.int32(cfg.max_num)), True
        if prune_step:
            min_opac = jnp.float32(C(cfg.min_opac_prune, 0, iteration))
            state = prune_op(state, min_opac, prune_big_points=cfg.prune_big_points)
            if iteration % cfg.opacity_reset_interval == 0:
                state = reset_opacity_op(state)
            changed = True
        if densify_step:
            key, sub = jax.random.split(key)
            state = densify_op(
                state,
                sub,
                jnp.float32(C(cfg.densify_grad_threshold, 0, iteration)),
                jnp.float32(C(cfg.split_thresh, 0, iteration)),
                sphere=cfg.sphere,
            )
            changed = True
        return state, changed

    # -- I/O ---------------------------------------------------------------
    def save_ply(self, state: GaussianState, path: str) -> None:
        alive = np.asarray(state.alive)
        p = state.params
        ply_io.save_gaussian_ply(
            path,
            xyz=np.asarray(p.xyz)[alive],
            features_dc=np.asarray(p.features_dc)[alive],
            features_rest=np.asarray(p.features_rest)[alive],
            opacity=np.asarray(p.opacity)[alive],
            scaling=np.asarray(p.scaling)[alive],
            rotation=np.asarray(p.rotation)[alive],
        )


# The reference registers its PLY/mesh I/O mixin as a standalone component
# (reference geometry/gaussian_io.py:34 "gaussian-splatting-io"); here that
# surface lives on GaussianField itself (save_ply above + models/ply_io.py /
# models/mesh_extract.py), so the name aliases onto the same class.
from ..utils import registry as _registry_mod  # noqa: E402

_registry_mod.registry["gaussian-splatting-io"] = GaussianField
