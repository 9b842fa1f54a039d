"""SuGaR: Gaussians bound to a surface mesh (reference geometry/sugar.py:40-988).

The scene representation after the SuGaR handoff: learnable mesh vertices,
`n_gaussians_per_surface_triangle` Gaussians at fixed barycentric coordinates
inside every face (1/3/4/6 layouts, reference :245-286), flat Gaussians with
two learned tangent scales plus a constant thickness along the face normal
(reference :489-497), rotations = face frame composed with a learned 2D
complex rotation (reference :499-528), SH color coefficients, and per-point
opacities.

Functional design: `SuGaRParams` holds the learnables; faces / barycentric
tables / topology are static buffers on the host wrapper.  All getters are
pure jitted functions of the params, so the whole pipeline (vertices ->
gaussians -> rasterizer) differentiates end-to-end into the mesh."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops import mesh as mesh_ops
from ..ops import quaternion
from ..ops.gaussian_math import inverse_sigmoid
from ..ops.sh import num_sh_bases, rgb_to_sh
from ..utils.config import C
from ..utils.registry import register
from .optim import AdamState, init_adam

BARY_TABLES = {
    1: (np.array([[1 / 3, 1 / 3, 1 / 3]], np.float32), 1.0 / 2.0 / np.sqrt(3.0)),
    3: (
        np.array(
            [[1 / 2, 1 / 4, 1 / 4], [1 / 4, 1 / 2, 1 / 4], [1 / 4, 1 / 4, 1 / 2]],
            np.float32,
        ),
        1.0 / 2.0 / (np.sqrt(3.0) + 1.0),
    ),
    4: (
        np.array(
            [
                [1 / 3, 1 / 3, 1 / 3],
                [2 / 3, 1 / 6, 1 / 6],
                [1 / 6, 2 / 3, 1 / 6],
                [1 / 6, 1 / 6, 2 / 3],
            ],
            np.float32,
        ),
        1.0 / (4.0 * np.sqrt(3.0)),
    ),
    6: (
        np.array(
            [
                [2 / 3, 1 / 6, 1 / 6],
                [1 / 6, 2 / 3, 1 / 6],
                [1 / 6, 1 / 6, 2 / 3],
                [1 / 6, 5 / 12, 5 / 12],
                [5 / 12, 1 / 6, 5 / 12],
                [5 / 12, 5 / 12, 1 / 6],
            ],
            np.float32,
        ),
        1.0 / (4.0 + 2.0 * np.sqrt(3.0)),
    ),
}


@struct.dataclass
class SuGaRParams:
    points: jnp.ndarray  # (V, 3) mesh vertices
    sh_dc: jnp.ndarray  # (Ng, 1, 3)
    sh_rest: jnp.ndarray  # (Ng, K-1, 3)
    scales: jnp.ndarray  # (Ng, 2) log tangent scales
    complex_rot: jnp.ndarray  # (Ng, 2) in-plane rotation (cos, sin)
    densities: jnp.ndarray  # (Ng, 1) opacity logits


@struct.dataclass
class SuGaRState:
    params: SuGaRParams
    adam: AdamState
    faces: jnp.ndarray  # (F, 3) int32, static topology
    bary: jnp.ndarray  # (G, 3) barycentric table
    thickness: jnp.ndarray  # () constant normal thickness

    @property
    def n_faces(self):
        return self.faces.shape[0]

    @property
    def n_gaussians(self):
        return self.faces.shape[0] * self.bary.shape[0]


@dataclasses.dataclass
class SuGaRConfig:
    """Mirrors reference SuGaRModel.Config (geometry/sugar.py:42-76)."""

    sh_levels: int = 1
    position_lr: Any = 0.001
    feature_lr: Any = 0.01
    opacity_lr: Any = 0.05
    scaling_lr: Any = 0.005
    rotation_lr: Any = 0.005
    triangle_scale: float = 1.0
    n_gaussians_per_surface_triangle: int = 1
    keep_track_of_knn: bool = False
    knn_to_track: int = 16
    beta_mode: str = "average"
    primitive_types: str = "diamond"
    surface_mesh_to_bind_path: str = ""
    learn_surface_mesh_positions: bool = True
    learn_surface_mesh_opacity: bool = True
    learn_surface_mesh_scales: bool = True
    freeze_gaussians: bool = False
    spatial_lr_scale: float = 10.0
    spatial_extent: float = 3.5
    color_clip: Any = 2.0
    gs_color_inherit_vertices: bool = True
    init_gs_opacity: float = 0.5
    geometry_convert_from: str = ""
    square_size_in_texture: int = 10
    pred_normal: bool = False


# ---------------------------------------------------------------------------
# Pure getters (reference :442-560)
# ---------------------------------------------------------------------------


def gaussian_positions(params: SuGaRParams, faces, bary) -> jnp.ndarray:
    """(Ng, 3): barycentric points inside every face (reference :450-465)."""
    faces_verts = params.points[faces]  # (F, 3, 3)
    pts = jnp.einsum("gk,fkc->fgc", bary, faces_verts)
    return pts.reshape(-1, 3)


def face_frames(params: SuGaRParams, faces):
    """(R0 normals, base_R1, base_R2) per face (reference :503-513)."""
    fn = mesh_ops.face_normals(params.points, faces)
    faces_verts = params.points[faces]
    r1 = faces_verts[:, 0] - faces_verts[:, 1]
    r1 = r1 / jnp.maximum(jnp.linalg.norm(r1, axis=-1, keepdims=True), 1e-12)
    r2 = jnp.cross(fn, r1)
    r2 = r2 / jnp.maximum(jnp.linalg.norm(r2, axis=-1, keepdims=True), 1e-12)
    return fn, r1, r2


def gaussian_quaternions(params: SuGaRParams, faces, n_per_face: int) -> jnp.ndarray:
    """(Ng, 4) wxyz: face frame composed with the learned in-plane rotation
    (reference :499-528: columns [normal, R1, R2])."""
    fn, base_r1, base_r2 = face_frames(params, faces)
    cn = params.complex_rot / jnp.maximum(
        jnp.linalg.norm(params.complex_rot, axis=-1, keepdims=True), 1e-12
    )
    cn = cn.reshape(faces.shape[0], n_per_face, 2)
    r1 = cn[..., 0:1] * base_r1[:, None] + cn[..., 1:2] * base_r2[:, None]
    r2 = -cn[..., 1:2] * base_r1[:, None] + cn[..., 0:1] * base_r2[:, None]
    r0 = jnp.broadcast_to(fn[:, None], r1.shape)
    rot = jnp.stack([r0, r1, r2], axis=-1)  # (F, G, 3, 3) columns
    return quaternion.from_rotation_matrix(rot.reshape(-1, 3, 3))


def gaussian_scaling(params: SuGaRParams, thickness) -> jnp.ndarray:
    """(Ng, 3): [thickness, exp(s1), exp(s2)] (reference :489-497)."""
    ng = params.scales.shape[0]
    return jnp.concatenate(
        [jnp.broadcast_to(thickness, (ng, 1)), jnp.exp(params.scales)], axis=-1
    )


def gaussian_strengths(params: SuGaRParams) -> jnp.ndarray:
    return jax.nn.sigmoid(params.densities)


def sh_coordinates(params: SuGaRParams, color_clip=np.inf) -> jnp.ndarray:
    dc = jnp.clip(params.sh_dc, -color_clip, color_clip)
    return jnp.concatenate([dc, params.sh_rest], axis=1)


def gs_normals(params: SuGaRParams, faces, n_per_face: int) -> jnp.ndarray:
    """Per-Gaussian face normal (reference :536-540)."""
    fn = mesh_ops.face_normals(params.points, faces)
    return jnp.repeat(fn, n_per_face, axis=0)


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------


@register("sugar")
class SuGaRModel:
    Config = SuGaRConfig

    def __init__(self, cfg=None, **kwargs):
        if cfg is None:
            cfg = type(self).Config(**kwargs)
        elif isinstance(cfg, dict):
            from ..utils.config import parse_structured

            cfg = parse_structured(type(self).Config, cfg)
        self.cfg = cfg
        # the reference evaluates ALL allocated bands
        # (sugar.py:650-665: sh_coordinates[:, :sh_levels ** 2])
        self.active_sh_degree = cfg.sh_levels - 1
        self.n_per_face = cfg.n_gaussians_per_surface_triangle
        self.bary_np, self.circle_radius = BARY_TABLES[self.n_per_face]
        self.topology: Optional[mesh_ops.MeshTopology] = None
        self._bound_mesh = None
        if cfg.surface_mesh_to_bind_path:
            verts, faces = mesh_ops.load_obj(cfg.surface_mesh_to_bind_path)
            self.bind_mesh(verts, faces)

    def bind_mesh(
        self,
        verts: np.ndarray,
        faces: np.ndarray,
        vert_colors: Optional[np.ndarray] = None,
    ) -> None:
        if vert_colors is None:
            vert_colors = np.full_like(verts, 0.5)
        verts, faces, vert_colors = mesh_ops.prune_isolated_components(
            verts, faces, vert_colors
        )
        self._bound_mesh = (
            verts.astype(np.float32),
            faces.astype(np.int32),
            vert_colors.astype(np.float32),
        )
        self.topology = mesh_ops.build_topology(faces, len(verts))

    def init_state(self, seed: int = 0) -> SuGaRState:
        if self._bound_mesh is None:
            raise ValueError(
                "SuGaR requires a surface mesh (surface_mesh_to_bind_path or "
                "bind_mesh from the gaussian-stage extraction)"
            )
        cfg = self.cfg
        verts, faces, vert_colors = self._bound_mesh
        n_faces = len(faces)
        ng = n_faces * self.n_per_face
        k_rest = num_sh_bases(cfg.sh_levels - 1) - 1 if cfg.sh_levels > 1 else 0

        # initial tangent scales from the shortest face edge (reference
        # initialize_learnable_radiuses, :311-345)
        fv = verts[faces]
        edge_len = np.linalg.norm(fv - fv[:, [1, 2, 0]], axis=-1).min(axis=-1)
        scales0 = np.maximum(edge_len * self.circle_radius, 1e-7)
        scales0 = np.log(scales0)[:, None, None].repeat(self.n_per_face, 1).repeat(
            2, 2
        )

        # colors from barycentric vertex colors (reference :222-236)
        if cfg.gs_color_inherit_vertices:
            fc = vert_colors[faces]  # (F, 3, 3)
            colors = np.einsum("gk,fkc->fgc", self.bary_np, fc).reshape(-1, 3)
        else:
            colors = np.full((ng, 3), 0.5, np.float32)

        cr = np.zeros((ng, 2), np.float32)
        cr[:, 0] = 1.0
        dens = np.full((ng, 1), cfg.init_gs_opacity, np.float32)

        params = SuGaRParams(
            points=jnp.asarray(verts),
            sh_dc=jnp.asarray(rgb_to_sh(jnp.asarray(colors)))[:, None, :],
            sh_rest=jnp.zeros((ng, k_rest, 3)),
            scales=jnp.asarray(scales0.reshape(ng, 2)),
            complex_rot=jnp.asarray(cr),
            densities=jnp.asarray(inverse_sigmoid(jnp.asarray(dens))),
        )
        return SuGaRState(
            params=params,
            adam=init_adam(params),
            faces=jnp.asarray(faces),
            bary=jnp.asarray(self.bary_np),
            thickness=jnp.float32(cfg.spatial_extent / 1_000_000),
        )

    # -- scheduled values ---------------------------------------------------
    def lr_tree(self, step: int) -> SuGaRParams:
        cfg = self.cfg

        def c(v, scale=1.0):
            return jnp.asarray(
                C(v, 0, step, interpolation="exp") * scale, jnp.float32
            )

        feat = C(cfg.feature_lr, 0, step, interpolation="exp")
        return SuGaRParams(
            points=c(cfg.position_lr, cfg.spatial_lr_scale),
            sh_dc=jnp.asarray(feat, jnp.float32),
            sh_rest=jnp.asarray(feat / 20.0, jnp.float32),
            scales=c(cfg.scaling_lr),
            complex_rot=c(cfg.rotation_lr),
            densities=c(cfg.opacity_lr),
        )

    def color_clip(self, step: int) -> float:
        return float(C(self.cfg.color_clip, 0, step))

    # -- conversions --------------------------------------------------------
    def as_gaussian_arrays(self, state: SuGaRState, color_clip=np.inf):
        """Everything the rasterizer needs, derived from the mesh binding."""
        p = state.params
        return dict(
            means3d=gaussian_positions(p, state.faces, state.bary),
            scales=gaussian_scaling(p, state.thickness),
            quats=gaussian_quaternions(p, state.faces, self.n_per_face),
            opacities=gaussian_strengths(p)[:, 0],
            sh_coeffs=sh_coordinates(p, color_clip),
            normals=gs_normals(p, state.faces, self.n_per_face),
        )

    def save_ply(self, state: SuGaRState, path: str) -> None:
        from . import ply_io

        arrays = self.as_gaussian_arrays(state)
        ng = arrays["means3d"].shape[0]
        ply_io.save_gaussian_ply(
            path,
            xyz=np.asarray(arrays["means3d"]),
            features_dc=np.asarray(state.params.sh_dc),
            features_rest=np.asarray(state.params.sh_rest),
            opacity=np.asarray(state.params.densities),
            scaling=np.log(np.maximum(np.asarray(arrays["scales"]), 1e-10)),
            rotation=np.asarray(arrays["quats"]),
        )

    def save_mesh_obj(self, state: SuGaRState, path: str) -> None:
        from .mesh_extract import save_obj

        save_obj(path, np.asarray(state.params.points), np.asarray(state.faces))

    # -- border-face postprocess (reference system/base.py:325-382) ----------
    def compute_density(
        self, state: SuGaRState, points: np.ndarray, k: int = 16
    ) -> np.ndarray:
        """Density field at world points: sum over the 16 nearest Gaussians
        of strength * exp(-1/2 d^T Sigma^-1 d) (the original SuGaR
        `compute_density` the reference calls at system/base.py:357 -- the
        method body lives upstream of the reference repo)."""
        from ..ops.knn import knn

        arrays = self.as_gaussian_arrays(state)
        means = arrays["means3d"]
        k = min(k, means.shape[0])
        _, idx = knn(jnp.asarray(points, jnp.float32), means, k)
        d = jnp.asarray(points)[:, None, :] - means[idx]  # (P, K, 3)
        rot = quaternion.to_rotation_matrix(arrays["quats"][idx])
        local = jnp.einsum("pkij,pki->pkj", rot, d)  # R^T d
        inv_var = 1.0 / jnp.maximum(arrays["scales"][idx] ** 2, 1e-12)
        q = jnp.sum(local * local * inv_var, axis=-1)
        dens = jnp.sum(arrays["opacities"][idx] * jnp.exp(-0.5 * q), axis=-1)
        return np.asarray(dens)

    def postprocess_state(
        self,
        state: SuGaRState,
        density_threshold: float = 0.1,
        iterations: int = 5,
    ) -> SuGaRState:
        """Remove low-density border faces before texture extraction
        (reference postprocess_mesh, system/base.py:325-382): peel
        `iterations` rings of border faces, then re-add peeled faces whose
        center density exceeds the threshold.  Per-face Gaussian params are
        subset; vertices are kept (the reference keeps all verts too) and the
        optimizer state is re-initialized (postprocess runs at predict time,
        after training)."""
        faces = np.asarray(state.faces)
        mask = mesh_ops.peel_border_faces(faces, iterations)
        removed = ~mask
        if removed.any():
            verts = np.asarray(state.params.points)
            centers = verts[faces[removed]].mean(axis=1)
            dens = self.compute_density(state, centers)
            mask[np.nonzero(removed)[0]] = dens > density_threshold
        if mask.all():
            return state
        if not mask.any():
            raise ValueError("postprocess would remove every face")
        gmask = np.repeat(mask, self.n_per_face)
        p = state.params
        new_params = SuGaRParams(
            points=p.points,
            sh_dc=p.sh_dc[gmask],
            sh_rest=p.sh_rest[gmask],
            scales=p.scales[gmask],
            complex_rot=p.complex_rot[gmask],
            densities=p.densities[gmask],
        )
        new_faces = jnp.asarray(faces[mask])
        self.topology = mesh_ops.build_topology(
            faces[mask], len(np.asarray(p.points))
        )
        return state.replace(
            params=new_params,
            adam=init_adam(new_params),
            faces=new_faces,
        )
