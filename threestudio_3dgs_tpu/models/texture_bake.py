"""Textured-mesh extraction for SuGaR (the --predict path, reference
system/base.py:72-323).

The reference builds a two-triangles-per-square UV atlas, initializes every
texel from the SH color of the locally densest Gaussian, rasterizes an
id-pass with a pytorch3d MeshRenderer per view, and scatter-averages image
pixels into individual texels (reference system/base.py:72-292).  Here the
id-pass runs through the pure-JAX z-buffered triangle rasterizer
(ops/tri_raster.py) and the scatters happen host-side at export time:

  * `build_triangle_uv_atlas` -- the reference's atlas layout: faces 2k /
    2k+1 share square k, triangles inset from the square border by the same
    margins (reference :100-131);
  * `init_texture_from_sh` -- per-texel barycentric position -> density
    against the face's own Gaussians -> argmax Gaussian's SH-dc color
    (reference :135-207);
  * `bake_texture_uv` -- per view: triangle id-pass (face id + barycentrics
    + zbuf), interpolate each image pixel's UV, scatter-average the rendered
    color into its texel (reference :253-292);
  * `save_textured_obj_uv` -- OBJ with 3 UVs per face + MTL + PNG
    (reference :294-323).

The older center-projection bake (one flat color per Gaussian square) is kept
as the `method="points"` fallback below."""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Per-texel UV bake (reference system/base.py:72-323)
# ---------------------------------------------------------------------------


def build_triangle_uv_atlas(n_faces: int, square_size: int = 10):
    """Reference atlas layout: faces 2k (bottom) and 2k+1 (top) share texel
    square k; triangle corners are inset from the square border so nearest
    sampling never bleeds across faces (reference system/base.py:88-131).

    Returns (tex_size, verts_uv (F, 3, 2) float32 in TEXEL coordinates
    (a=column, b=row)); normalized OBJ vt = (a/tex, 1 - b/tex)."""
    ss = square_size
    n_squares = n_faces // 2 + 1
    n_axis = int(np.sqrt(n_squares) + 1)
    tex_size = ss * n_axis

    sq = np.arange(n_faces) // 2
    top = (np.arange(n_faces) % 2).astype(bool)
    origin = np.stack([sq % n_axis, sq // n_axis], axis=1) * ss  # (F, 2) (a, b)

    # in-square triangle corners, inset by the reference's margins
    # (system/base.py:125-131: bottom [-2,1],[2,1],[-2,-3]; top [1,-1],[1,3],[-3,-1])
    bottom_local = np.array([[ss - 2, 1], [2, 1], [ss - 2, ss - 3]], np.float32)
    top_local = np.array([[1, ss - 1], [1, 3], [ss - 3, ss - 1]], np.float32)
    local = np.where(top[:, None, None], top_local[None], bottom_local[None])
    verts_uv = origin[:, None, :].astype(np.float32) + local
    return tex_size, verts_uv


def _uv_bary(p: np.ndarray, tri: np.ndarray) -> np.ndarray:
    """Signed barycentric of points p (..., 2) wrt triangles tri (..., 3, 2)."""
    v0, v1, v2 = tri[..., 0, :], tri[..., 1, :], tri[..., 2, :]

    def cross(a, b):
        return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]

    area = cross(v1 - v0, v2 - v0)
    inv = 1.0 / np.where(np.abs(area) < 1e-12, 1.0, area)
    b0 = cross(v2 - v1, p - v1) * inv
    b1 = cross(v0 - v2, p - v2) * inv
    return np.stack([b0, b1, 1.0 - b0 - b1], axis=-1)


def init_texture_from_sh(
    verts: np.ndarray,  # (V, 3)
    faces: np.ndarray,  # (F, 3)
    verts_uv: np.ndarray,  # (F, 3, 2) texel coords
    tex_size: int,
    square_size: int,
    gauss_xyz: np.ndarray,  # (F*G, 3) per-face Gaussian centers
    gauss_inv_rot: np.ndarray,  # (F*G, 3, 3) R diag(1/s) "sqrt inverse cov"
    gauss_rgb: np.ndarray,  # (F*G, 3) SH2RGB'd dc colors
    chunk: int = 16384,
) -> np.ndarray:
    """Initialize every texel from the SH color of the face Gaussian densest
    at the texel's 3D position (reference system/base.py:186-207).  Every
    texel of a face pair's square gets assigned to the nearer triangle (the
    reference leaves gutter texels at 0; filling them kills bleed artifacts
    under nearest sampling, a conscious improvement)."""
    ss = square_size
    n_faces = len(faces)
    n_g = len(gauss_xyz) // n_faces
    texture = np.full((tex_size, tex_size, 3), 0.5, np.float32)

    # local texel centers of one square: (ss*ss, 2) in (a, b)
    jj, ii = np.meshgrid(np.arange(ss), np.arange(ss), indexing="ij")
    local_px = np.stack([ii + 0.5, jj + 0.5], axis=-1).reshape(-1, 2).astype(
        np.float32
    )  # b = row = j, a = col = i

    for f0 in range(0, n_faces, chunk):
        f1 = min(f0 + chunk, n_faces)
        fc = np.arange(f0, f1)
        uv = verts_uv[fc]  # (C, 3, 2)
        sq_origin = (uv.min(axis=1) // ss) * ss  # (C, 2) square corner
        px = sq_origin[:, None, :] + local_px[None]  # (C, P, 2)
        bary = _uv_bary(px, uv[:, None, :, :])  # (C, P, 3)
        # texels of the square belong to the face whose triangle they are
        # least outside of; the partner face computes its own competing bary
        partner = fc ^ 1
        partner = np.where(partner < n_faces, partner, fc)
        bary_p = _uv_bary(px, verts_uv[partner][:, None, :, :])
        mine = bary.min(axis=-1) >= bary_p.min(axis=-1)  # (C, P)
        bary_cl = np.clip(bary, 0.0, None)
        bary_cl /= np.maximum(bary_cl.sum(axis=-1, keepdims=True), 1e-8)

        pos = np.einsum("cpk,ckx->cpx", bary_cl, verts[faces[fc]])  # (C, P, 3)
        g_idx = fc[:, None] * n_g + np.arange(n_g)[None]  # (C, G)
        shift = pos[:, :, None, :] - gauss_xyz[g_idx][:, None, :, :]
        warped = np.einsum("cgxy,cpgx->cpgy", gauss_inv_rot[g_idx], shift)
        dens = np.exp(-0.5 * np.clip((warped**2).sum(-1), 0.0, 1e8))  # (C, P, G)
        best = dens.argmax(axis=-1)  # (C, P)
        color = gauss_rgb[np.take_along_axis(g_idx[:, None, :],
                                             best[..., None], -1)[..., 0]]

        a = np.clip(px[..., 0].astype(np.int64), 0, tex_size - 1)
        b = np.clip(px[..., 1].astype(np.int64), 0, tex_size - 1)
        texture[b[mine], a[mine]] = color[mine]
    return texture


def bake_texture_uv(
    verts: np.ndarray,
    faces: np.ndarray,
    verts_uv: np.ndarray,  # (F, 3, 2) texel coords
    tex_size: int,
    renders: List[Dict],  # per view: {"rgb" (H, W, 3), "camera"}
    init_texture: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Per-texel bake: triangle id-pass per view, scatter-average image
    pixels into the texels their UVs hit (reference system/base.py:253-292;
    `use_average=True` branch).  Texels no view sees keep `init_texture`."""
    from ..ops.tri_raster import rasterize_triangles_camera

    n_faces = len(faces)
    max_pairs = max(1 << 18, 1 << int(np.ceil(np.log2(max(6 * n_faces, 2)))))
    accum = np.zeros((tex_size, tex_size, 3), np.float64)
    count = np.zeros((tex_size, tex_size), np.int64)

    for view in renders:
        cam = view["camera"]
        rgb = np.asarray(view["rgb"])
        out = rasterize_triangles_camera(
            verts, faces, cam, max_pairs=max_pairs, max_faces_per_tile=1024
        )
        fid = np.asarray(out.face_id)
        bary = np.asarray(out.bary)
        hit = fid >= 0
        f_hit = fid[hit]
        uv = np.einsum("pk,pkx->px", bary[hit], verts_uv[f_hit])  # (Ph, 2)
        a = np.clip(np.floor(uv[:, 0]).astype(np.int64), 0, tex_size - 1)
        b = np.clip(np.floor(uv[:, 1]).astype(np.int64), 0, tex_size - 1)
        np.add.at(accum, (b, a), rgb[hit])
        np.add.at(count, (b, a), 1)

    baked = accum / np.maximum(count, 1)[..., None]
    if init_texture is None:
        init_texture = np.full((tex_size, tex_size, 3), 0.5, np.float32)
    return np.where(
        (count > 0)[..., None], baked.astype(np.float32), init_texture
    )


def save_textured_obj_uv(
    path: str,
    verts: np.ndarray,
    faces: np.ndarray,
    verts_uv: np.ndarray,  # (F, 3, 2) texel coords
    tex_size: int,
    texture: np.ndarray,
) -> str:
    """OBJ + MTL + PNG with 3 distinct UVs per face (reference save_obj call
    at system/base.py:313-323).  vt = (a/tex, 1 - b/tex), PNG row 0 = b 0."""
    base = os.path.splitext(path)[0]
    import imageio.v2 as imageio

    imageio.imwrite(base + ".png", (np.clip(texture, 0, 1) * 255).astype(np.uint8))
    with open(base + ".mtl", "w") as f:
        f.write(
            f"newmtl baked\nKa 1.0 1.0 1.0\nKd 1.0 1.0 1.0\n"
            f"map_Kd {os.path.basename(base)}.png\n"
        )
    uv_flat = verts_uv.reshape(-1, 2) / float(tex_size)
    with open(path, "w") as f:
        f.write(f"mtllib {os.path.basename(base)}.mtl\nusemtl baked\n")
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for u, vv in uv_flat:
            f.write(f"vt {u:.6f} {1.0 - vv:.6f}\n")
        for fi, tri in enumerate(faces):
            t = 3 * fi
            f.write(
                f"f {tri[0] + 1}/{t + 1} {tri[1] + 1}/{t + 2} {tri[2] + 1}/{t + 3}\n"
            )
    return path


# ---------------------------------------------------------------------------
# Legacy center-projection bake (method="points" fallback)
# ---------------------------------------------------------------------------


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
    method: str = "uv",
) -> str:
    """Full predict path: render the views, bake, save (reference
    on_predict_start/predict_step/on_predict_epoch_end, system/base.py:72-323).

    method="uv" (default): per-texel bake through the JAX triangle id-pass;
    method="points": legacy flat-color-per-Gaussian-square fallback."""
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
    verts = np.asarray(sugar_state.params.points)
    faces = np.asarray(sugar_state.faces)

    if method == "points" or square_size < 6:
        texture, uv_centers = bake_texture(xyz, normals, renders, square_size)
        face_gauss_idx = np.arange(len(faces)) * sugar_model.n_per_face
        return save_textured_obj(
            out_path, verts, faces, face_gauss_idx, uv_centers, texture
        )

    from ..ops import quaternion
    from ..ops.sh import sh_to_rgb

    tex_size, verts_uv = build_triangle_uv_atlas(len(faces), square_size)
    scales = np.asarray(arrays["scales"])  # (Ng, 3) activated
    rot = np.asarray(quaternion.to_rotation_matrix(arrays["quats"]))
    inv_rot = rot / np.maximum(scales[:, None, :], 1e-12)  # R diag(1/s)
    rgb_dc = np.asarray(sh_to_rgb(np.asarray(arrays["sh_coeffs"])[:, 0]))
    init_tex = init_texture_from_sh(
        verts, faces, verts_uv, tex_size, square_size,
        xyz, inv_rot, np.clip(rgb_dc, 0.0, 1.0),
    )
    texture = bake_texture_uv(verts, faces, verts_uv, tex_size, renders, init_tex)
    return save_textured_obj_uv(
        out_path, verts, faces, verts_uv, tex_size, texture
    )
