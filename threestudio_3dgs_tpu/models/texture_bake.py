"""Textured-mesh extraction for SuGaR (the --predict path, reference
system/base.py:72-323).

The reference builds a per-point square UV atlas, rasterizes an id-pass with
a pytorch3d MeshRenderer per view, and scatter-averages view colors into the
texture.  Here (export-time, host numpy + jitted renders):

  1. UV atlas: every Gaussian owns a `square_size`^2 texel square in a
     near-square grid (reference :72-251);
  2. per-view bake: render the scene from each view and project every
     Gaussian center into the view; a Gaussian accumulates the image color at
     its pixel weighted by its visibility (screen radius > 0 and in-bounds),
     i.e. the reference's rasterize-and-average reduced to the Gaussian
     primitives themselves (they tile the surface densely by construction);
  3. normalize by the counter and write the texture png + an OBJ with UVs
     (reference :294-323).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np


def build_point_uv_atlas(n_points: int, square_size: int = 10):
    """Per-point texel squares in a near-square grid.
    Returns (tex_size, uv_centers (N, 2) in [0,1], square origin (N, 2) px)."""
    n_sq = int(np.ceil(np.sqrt(n_points)))
    tex_size = n_sq * square_size
    idx = np.arange(n_points)
    gx = idx % n_sq
    gy = idx // n_sq
    origin = np.stack([gx, gy], axis=1) * square_size
    centers = (origin + square_size / 2.0) / tex_size
    return tex_size, centers.astype(np.float32), origin.astype(np.int32)


def project_points(points: np.ndarray, camera) -> Tuple[np.ndarray, np.ndarray]:
    """Pixel coordinates + view depth for world points under a Camera."""
    w2c = np.asarray(camera.w2c)
    proj = np.asarray(camera.full_proj)
    p_view = points @ w2c[:3, :3].T + w2c[:3, 3]
    p_hom = points @ proj[:3, :3].T + proj[:3, 3]
    w_hom = points @ proj[3, :3] + proj[3, 3]
    ndc = p_hom[:, :2] / np.maximum(w_hom[:, None], 1e-6)
    px = ((ndc[:, 0] + 1.0) * camera.width - 1.0) * 0.5
    py = ((ndc[:, 1] + 1.0) * camera.height - 1.0) * 0.5
    return np.stack([px, py], axis=1), p_view[:, 2]


def bake_texture(
    gauss_xyz: np.ndarray,  # (Ng, 3)
    gauss_normals: np.ndarray,  # (Ng, 3)
    renders: List[Dict],  # per view: {"rgb" (H, W, 3), "depth" (H, W), "camera"}
    square_size: int = 10,
    depth_tol: float = 0.05,
) -> Tuple[np.ndarray, np.ndarray]:
    """Average view colors into per-point texture squares.
    Returns (texture (T, T, 3) float, uv_centers (Ng, 2))."""
    n = len(gauss_xyz)
    tex_size, uv_centers, origins = build_point_uv_atlas(n, square_size)
    accum = np.zeros((n, 3), np.float64)
    count = np.zeros((n, 1), np.float64)

    for view in renders:
        cam = view["camera"]
        rgb = np.asarray(view["rgb"])
        depth = np.asarray(view["depth"]) if view.get("depth") is not None else None
        pix, z = project_points(gauss_xyz, cam)
        xi = np.round(pix[:, 0]).astype(np.int64)
        yi = np.round(pix[:, 1]).astype(np.int64)
        ok = (
            (z > 0.2)
            & (xi >= 0)
            & (xi < cam.width)
            & (yi >= 0)
            & (yi < cam.height)
        )
        # backface cull: only bake views that see the front of the surface
        campos = np.asarray(cam.campos)
        view_dir = campos[None] - gauss_xyz
        facing = np.sum(view_dir * gauss_normals, axis=-1) > 0
        ok &= facing
        if depth is not None:
            # occlusion test against the rendered depth
            surf = depth[np.clip(yi, 0, cam.height - 1), np.clip(xi, 0, cam.width - 1)]
            ok &= np.abs(z - surf) < depth_tol * np.maximum(z, 1.0)
        xi_c = np.clip(xi, 0, cam.width - 1)
        yi_c = np.clip(yi, 0, cam.height - 1)
        colors = rgb[yi_c, xi_c]
        accum[ok] += colors[ok]
        count[ok] += 1.0

    point_colors = np.where(count > 0, accum / np.maximum(count, 1.0), 0.5)
    texture = np.full((tex_size, tex_size, 3), 0.5, np.float32)
    s = square_size
    for i in range(n):
        ox, oy = origins[i]
        texture[oy : oy + s, ox : ox + s] = point_colors[i]
    return texture, uv_centers


def save_textured_obj(
    path: str,
    verts: np.ndarray,
    faces: np.ndarray,
    face_gauss_idx: np.ndarray,  # (F,) index of a Gaussian per face
    uv_centers: np.ndarray,
    texture: np.ndarray,
) -> str:
    """OBJ + MTL + PNG: each face maps to its Gaussian's texture square
    (flat-per-face UVs, the reference's per-point-square layout)."""
    base = os.path.splitext(path)[0]
    import imageio.v2 as imageio

    imageio.imwrite(base + ".png", (np.clip(texture, 0, 1) * 255).astype(np.uint8))
    with open(base + ".mtl", "w") as f:
        f.write(
            f"newmtl baked\nKa 1.0 1.0 1.0\nKd 1.0 1.0 1.0\n"
            f"map_Kd {os.path.basename(base)}.png\n"
        )
    with open(path, "w") as f:
        f.write(f"mtllib {os.path.basename(base)}.mtl\nusemtl baked\n")
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for gi in face_gauss_idx:
            u, vv = uv_centers[gi]
            f.write(f"vt {u:.6f} {1.0 - vv:.6f}\n")
        for fi, tri in enumerate(faces):
            t = fi + 1
            f.write(
                f"f {tri[0] + 1}/{t} {tri[1] + 1}/{t} {tri[2] + 1}/{t}\n"
            )
    return path


def extract_textured_mesh(
    sugar_model,
    sugar_state,
    render_views_fn,
    views: List[Dict],
    out_path: str,
    square_size: int = 10,
) -> str:
    """Full predict path: render the views, bake, save (reference
    on_predict_start/predict_step/on_predict_epoch_end)."""
    from ..ops.camera import camera_from_c2w

    arrays = sugar_model.as_gaussian_arrays(sugar_state)
    xyz = np.asarray(arrays["means3d"])
    normals = np.asarray(arrays["normals"])

    renders = []
    outs = render_views_fn(views)
    for view, out in zip(views, outs):
        fovy = float(np.asarray(view["fovy"][0]))
        cam = camera_from_c2w(
            np.asarray(view["c2w"][0]), fovy, fovy,
            int(view["height"]), int(view["width"]),
        )
        renders.append(
            {
                "rgb": out["comp_rgb"][0],
                "depth": out["comp_depth"][0, :, :, 0]
                if "comp_depth" in out
                else None,
                "camera": cam,
            }
        )
    texture, uv_centers = bake_texture(xyz, normals, renders, square_size)
    verts = np.asarray(sugar_state.params.points)
    faces = np.asarray(sugar_state.faces)
    # one gaussian per face (its first) indexes the texture square
    face_gauss_idx = np.arange(len(faces)) * sugar_model.n_per_face
    return save_textured_obj(
        out_path, verts, faces, face_gauss_idx, uv_centers, texture
    )
