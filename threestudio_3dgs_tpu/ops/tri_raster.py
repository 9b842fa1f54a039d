"""Z-buffered triangle id-pass rasterizer (pure JAX, jit-friendly).

TPU-native replacement for the small pytorch3d `MeshRasterizer` the reference
uses ONLY for texture baking (reference system/base.py:214-292: an id-pass
with `faces_per_pixel=1`, nearest-texel UV sampling, zbuf occlusion mask).
Nothing here needs gradients -- the bake runs at export time -- so the design
optimizes for static shapes and vectorization, not for a custom VJP:

  1. project vertices to pixel space (same camera/ndc2Pix convention as the
     Gaussian rasterizer, ops/camera.py);
  2. bin faces to `tile x tile` pixel tiles via screen bboxes, expanding to a
     static-capacity (tile, face) pair table (`jnp.repeat` with
     total_repeat_length -- same masked-expansion pattern as
     ops/rasterizer/binning.py);
  3. sort pairs by tile, pad each tile's face list to `max_faces_per_tile`;
  4. `lax.scan` over face-chunks: each step evaluates edge functions for
     (n_tiles, chunk, tile*tile pixels) and folds a running z-min into the
     per-pixel (zbuf, face_id, barycentrics) state.

Barycentrics are screen-space (pytorch3d's `perspective_correct=False`
default, which is what the reference bake uses); both windings rasterize
(pytorch3d `cull_backfaces=False` default).  Faces with any vertex behind
znear are culled rather than clipped -- for object-centric export views this
matches pytorch3d behavior on every face actually visible.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class TriRasterOut(NamedTuple):
    face_id: jnp.ndarray  # (H, W) int32, -1 where no face
    bary: jnp.ndarray  # (H, W, 3) screen-space barycentric of the hit
    zbuf: jnp.ndarray  # (H, W) view-space depth of the hit, -1 where none
    n_dropped_pairs: jnp.ndarray  # () int32 pair-table overflow diagnostic
    n_dropped_tile: jnp.ndarray  # () int32 per-tile-capacity overflow


@partial(
    jax.jit,
    static_argnames=("height", "width", "tile", "max_pairs", "max_faces_per_tile"),
)
def rasterize_triangles(
    verts: jnp.ndarray,  # (V, 3) world space
    faces: jnp.ndarray,  # (F, 3) int32
    w2c: jnp.ndarray,  # (4, 4) world->camera (OpenCV, +z forward)
    full_proj: jnp.ndarray,  # (4, 4) world->clip
    *,
    height: int,
    width: int,
    znear: float = 0.1,
    tile: int = 16,
    max_pairs: int = 1 << 18,
    max_faces_per_tile: int = 256,
    chunk: int = 8,
) -> TriRasterOut:
    f32 = jnp.float32
    verts = verts.astype(f32)
    n_faces = faces.shape[0]

    # --- 1. project vertices (ndc2Pix convention, ops/camera.py) -----------
    ones = jnp.ones((verts.shape[0], 1), f32)
    vh = jnp.concatenate([verts, ones], axis=-1)
    clip = jnp.matmul(vh, full_proj.T, precision=jax.lax.Precision.HIGHEST)
    w = clip[:, 3]
    safe_w = jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)
    ndc = clip[:, :2] / safe_w[:, None]
    px = ((ndc[:, 0] + 1.0) * width - 1.0) * 0.5
    py = ((ndc[:, 1] + 1.0) * height - 1.0) * 0.5
    vdepth = (
        jnp.matmul(vh, w2c[2:3].T, precision=jax.lax.Precision.HIGHEST)[:, 0]
    )  # view-space z

    pts = jnp.stack([px, py], axis=-1)  # (V, 2)
    fv = pts[faces]  # (F, 3, 2)
    fz = vdepth[faces]  # (F, 3)

    # --- 2. face -> tile bboxes --------------------------------------------
    n_tx = -(-width // tile)
    n_ty = -(-height // tile)
    n_tiles = n_tx * n_ty

    in_front = jnp.all(fz > znear, axis=-1)
    xmin = jnp.min(fv[..., 0], axis=-1)
    xmax = jnp.max(fv[..., 0], axis=-1)
    ymin = jnp.min(fv[..., 1], axis=-1)
    ymax = jnp.max(fv[..., 1], axis=-1)
    on_screen = (xmax >= 0) & (xmin <= width - 1) & (ymax >= 0) & (ymin <= height - 1)
    valid = in_front & on_screen

    tx0 = jnp.clip(jnp.floor(xmin / tile), 0, n_tx - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(xmax / tile), 0, n_tx - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(ymin / tile), 0, n_ty - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(ymax / tile), 0, n_ty - 1).astype(jnp.int32)
    bw = tx1 - tx0 + 1
    counts = jnp.where(valid, bw * (ty1 - ty0 + 1), 0)

    offsets = jnp.cumsum(counts) - counts  # exclusive
    total = offsets[-1] + counts[-1] if n_faces else jnp.int32(0)
    n_dropped_pairs = jnp.maximum(total - max_pairs, 0).astype(jnp.int32)

    pair_face = jnp.repeat(
        jnp.arange(n_faces, dtype=jnp.int32),
        counts,
        total_repeat_length=max_pairs,
    )
    pair_ok = jnp.arange(max_pairs) < jnp.minimum(total, max_pairs)
    ordinal = jnp.arange(max_pairs, dtype=jnp.int32) - offsets[pair_face]
    p_bw = bw[pair_face]
    d_y = ordinal // jnp.maximum(p_bw, 1)
    d_x = ordinal - d_y * jnp.maximum(p_bw, 1)
    pair_tile = (ty0[pair_face] + d_y) * n_tx + (tx0[pair_face] + d_x)
    pair_tile = jnp.where(pair_ok, pair_tile, n_tiles).astype(jnp.int32)

    # --- 3. sort by tile, pad per-tile lists --------------------------------
    pair_tile, pair_face = jax.lax.sort((pair_tile, pair_face), num_keys=1)
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    start = jnp.searchsorted(pair_tile, tile_ids, side="left")
    end = jnp.searchsorted(pair_tile, tile_ids + 1, side="left")
    tcount = end - start
    n_dropped_tile = jnp.sum(jnp.maximum(tcount - max_faces_per_tile, 0)).astype(
        jnp.int32
    )

    k_pad = -(-max_faces_per_tile // chunk) * chunk
    slot = jnp.arange(k_pad, dtype=jnp.int32)
    slot_idx = jnp.clip(start[:, None] + slot[None, :], 0, max_pairs - 1)
    slot_ok = slot[None, :] < jnp.minimum(tcount, max_faces_per_tile)[:, None]
    tile_faces = jnp.where(slot_ok, pair_face[slot_idx], 0)  # (T, K)

    # pixel centers per tile: (T, P, 2) with P = tile*tile
    t_x = (tile_ids % n_tx) * tile
    t_y = (tile_ids // n_tx) * tile
    lx = jnp.arange(tile, dtype=f32)
    gx = t_x[:, None, None] + lx[None, None, :]  # (T, 1, tile)
    gy = t_y[:, None, None] + lx[None, :, None]  # (T, tile, 1)
    pix = jnp.stack(
        [
            jnp.broadcast_to(gx, (n_tiles, tile, tile)).reshape(n_tiles, -1),
            jnp.broadcast_to(gy, (n_tiles, tile, tile)).reshape(n_tiles, -1),
        ],
        axis=-1,
    )  # (T, P, 2)

    n_pix = tile * tile

    # --- 4. scan over face chunks, fold z-min -------------------------------
    def body(carry, k0):
        zbuf, fid, bc = carry
        f = jax.lax.dynamic_slice_in_dim(tile_faces, k0, chunk, axis=1)  # (T, c)
        ok = jax.lax.dynamic_slice_in_dim(slot_ok, k0, chunk, axis=1)
        v = fv[f]  # (T, c, 3, 2)
        z3 = fz[f]  # (T, c, 3)

        p = pix[:, None, :, :]  # (T, 1, P, 2)
        d0 = p - v[:, :, 0, None, :]  # (T, c, P, 2)
        d1 = p - v[:, :, 1, None, :]
        d2 = p - v[:, :, 2, None, :]
        e12 = v[:, :, 2] - v[:, :, 1]  # (T, c, 2)
        e20 = v[:, :, 0] - v[:, :, 2]
        e01 = v[:, :, 1] - v[:, :, 0]
        # edge function: cross(edge, p - edge_start); e0 ~ area(v1,v2,p)
        e0 = e12[..., None, 0] * d1[..., 1] - e12[..., None, 1] * d1[..., 0]
        e1 = e20[..., None, 0] * d2[..., 1] - e20[..., None, 1] * d2[..., 0]
        e2 = e01[..., None, 0] * d0[..., 1] - e01[..., None, 1] * d0[..., 0]
        area = e0 + e1 + e2  # (T, c, P) constant over P up to fp error
        pos = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (area > 1e-9)
        neg = (e0 <= 0) & (e1 <= 0) & (e2 <= 0) & (area < -1e-9)
        cover = (pos | neg) & ok[..., None]

        inv_a = 1.0 / jnp.where(jnp.abs(area) < 1e-12, 1.0, area)
        b0 = e0 * inv_a
        b1 = e1 * inv_a
        b2 = 1.0 - b0 - b1
        z = b0 * z3[..., 0:1] + b1 * z3[..., 1:2] + b2 * z3[..., 2:3]
        z = jnp.where(cover & (z > znear), z, jnp.inf)  # (T, c, P)

        zmin = jnp.min(z, axis=1)  # (T, P)
        amin = jnp.argmin(z, axis=1)  # (T, P)
        upd = zmin < zbuf
        take = lambda arr: jnp.take_along_axis(arr, amin[:, None, :], axis=1)[:, 0]
        new_fid = take(f[..., None] * jnp.ones((1, 1, n_pix), jnp.int32))
        new_b = jnp.stack([take(b0), take(b1), take(b2)], axis=-1)  # (T, P, 3)
        zbuf = jnp.where(upd, zmin, zbuf)
        fid = jnp.where(upd, new_fid, fid)
        bc = jnp.where(upd[..., None], new_b, bc)
        return (zbuf, fid, bc), None

    init = (
        jnp.full((n_tiles, n_pix), jnp.inf, f32),
        jnp.full((n_tiles, n_pix), -1, jnp.int32),
        jnp.zeros((n_tiles, n_pix, 3), f32),
    )
    (zbuf, fid, bc), _ = jax.lax.scan(
        body, init, jnp.arange(0, k_pad, chunk), unroll=1
    )

    # --- 5. tiles -> image ---------------------------------------------------
    def untile(a, ch=None):
        shape = (n_ty, n_tx, tile, tile) + ((ch,) if ch else ())
        a = a.reshape(shape)
        a = jnp.moveaxis(a, 2, 1)  # (n_ty, tile, n_tx, tile[, ch])
        a = a.reshape((n_ty * tile, n_tx * tile) + ((ch,) if ch else ()))
        return a[:height, :width]

    face_id = untile(fid)
    zimg = untile(zbuf)
    zimg = jnp.where(face_id >= 0, zimg, -1.0)
    bary = untile(bc, 3)
    return TriRasterOut(face_id, bary, zimg, n_dropped_pairs, n_dropped_tile)


def rasterize_triangles_camera(verts, faces, camera, **kw) -> TriRasterOut:
    """Convenience entry taking an ops.camera.Camera."""
    return rasterize_triangles(
        jnp.asarray(verts),
        jnp.asarray(faces, jnp.int32),
        jnp.asarray(camera.w2c),
        jnp.asarray(camera.full_proj),
        height=camera.height,
        width=camera.width,
        znear=float(camera.znear),
        **kw,
    )
