"""Triangle id-pass rasterizer + per-texel UV texture bake.

Covers VERDICT round-1 gap #2: the reference bakes by rasterizing an id-pass
per view and scatter-averaging image pixels into individual texels
(reference system/base.py:214-292); these tests pin occlusion, barycentric
interpolation, intra-square texture gradients, and bake round-trip."""

import numpy as np
import pytest

import jax.numpy as jnp

from threestudio_3dgs_tpu.ops.camera import camera_from_c2w
from threestudio_3dgs_tpu.ops.tri_raster import rasterize_triangles_camera
from threestudio_3dgs_tpu.models.texture_bake import (
    bake_texture_uv,
    build_triangle_uv_atlas,
    init_texture_from_sh,
    save_textured_obj_uv,
)


def front_camera(h=64, w=64, fov=0.8):
    """Identity c2w: camera at origin looking down -z (OpenGL)."""
    return camera_from_c2w(jnp.eye(4), fov, fov, h, w)


def quad_mesh(z=-2.0, half=0.8):
    """Two triangles forming a quad facing the camera at depth z."""
    verts = np.array(
        [
            [-half, -half, z],
            [half, -half, z],
            [half, half, z],
            [-half, half, z],
        ],
        np.float32,
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return verts, faces


class TestTriRaster:
    def test_occlusion_near_wins(self):
        cam = front_camera()
        verts = np.array(
            [
                [-1.5, -1.5, -3], [1.5, -1.5, -3], [0, 1.5, -3],  # far
                [-0.4, -0.4, -2], [0.4, -0.4, -2], [0, 0.5, -2],  # near
            ],
            np.float32,
        )
        faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        out = rasterize_triangles_camera(verts, faces, cam)
        fid = np.asarray(out.face_id)
        assert fid[32, 32] == 1  # near triangle wins the center
        assert fid[0, 0] == -1  # empty corner
        assert fid[50, 32] == 0  # far triangle where near one ends
        assert abs(float(out.zbuf[32, 32]) - 2.0) < 1e-3
        assert float(out.zbuf[0, 0]) == -1.0
        # order independence: swapping face order must not change the winner
        out2 = rasterize_triangles_camera(verts, faces[::-1].copy(), cam)
        assert np.asarray(out2.face_id)[32, 32] == 0

    def test_barycentric_interpolation(self):
        cam = front_camera(128, 128)
        verts, faces = quad_mesh()
        out = rasterize_triangles_camera(verts, faces, cam)
        fid = np.asarray(out.face_id)
        bary = np.asarray(out.bary)
        hit = fid >= 0
        assert hit.sum() > 1000
        s = bary[hit].sum(-1)
        assert np.abs(s - 1.0).max() < 1e-5
        assert bary[hit].min() > -1e-5
        # reconstruct world position; constant-z plane makes screen-space
        # bary exact; reproject must land on the source pixel
        ys, xs = np.nonzero(hit)
        pos = (bary[hit][:, :, None] * verts[faces[fid[hit]]]).sum(1)
        w2c = np.asarray(cam.full_proj)
        ph = pos @ w2c[:3, :3].T + w2c[:3, 3]
        wh = pos @ w2c[3, :3] + w2c[3, 3]
        ndc = ph[:, :2] / wh[:, None]
        px = ((ndc[:, 0] + 1) * cam.width - 1) / 2
        py = ((ndc[:, 1] + 1) * cam.height - 1) / 2
        assert np.abs(px - xs).max() < 1e-2
        assert np.abs(py - ys).max() < 1e-2

    def test_backface_rasterizes(self):
        # pytorch3d's default cull_backfaces=False: winding must not matter
        cam = front_camera()
        verts, faces = quad_mesh()
        flipped = faces[:, ::-1].copy()
        a = np.asarray(rasterize_triangles_camera(verts, faces, cam).face_id)
        b = np.asarray(rasterize_triangles_camera(verts, flipped, cam).face_id)
        assert (a >= 0).sum() == (b >= 0).sum()

    def test_behind_camera_culled(self):
        cam = front_camera()
        verts = np.array(
            [[-1, -1, 2], [1, -1, 2], [0, 1, 2]], np.float32  # behind (+z)
        )
        faces = np.array([[0, 1, 2]], np.int32)
        out = rasterize_triangles_camera(verts, faces, cam)
        assert (np.asarray(out.face_id) == -1).all()


class TestUVAtlas:
    def test_layout(self):
        tex, uv = build_triangle_uv_atlas(10, square_size=10)
        assert uv.shape == (10, 3, 2)
        # each face's verts stay inside its own square
        sq = np.arange(10) // 2
        n_axis = int(np.sqrt(10 // 2 + 1) + 1)
        ox = (sq % n_axis) * 10
        oy = (sq // n_axis) * 10
        assert (uv[..., 0] >= ox[:, None]).all()
        assert (uv[..., 0] <= ox[:, None] + 10).all()
        assert (uv[..., 1] >= oy[:, None]).all()
        assert (uv[..., 1] <= oy[:, None] + 10).all()
        # bottom and top triangles of one square must not overlap: check
        # that no texel center is strictly inside both
        from threestudio_3dgs_tpu.models.texture_bake import _uv_bary

        jj, ii = np.meshgrid(np.arange(10), np.arange(10), indexing="ij")
        px = np.stack([ii + 0.5, jj + 0.5], -1).reshape(-1, 2)
        b0 = _uv_bary(px, np.broadcast_to(uv[0], (100, 3, 2)))
        b1 = _uv_bary(px, np.broadcast_to(uv[1], (100, 3, 2)))
        inside_both = (b0.min(-1) > 0) & (b1.min(-1) > 0)
        assert not inside_both.any()


class TestPerTexelBake:
    def _bake_gradient(self):
        """Bake a screen-space horizontal color gradient onto a quad."""
        h = w = 128
        cam = front_camera(h, w)
        verts, faces = quad_mesh()
        tex, uv = build_triangle_uv_atlas(len(faces), square_size=16)
        rgb = np.zeros((h, w, 3), np.float32)
        rgb[..., 0] = np.linspace(0, 1, w)[None, :]
        rgb[..., 1] = np.linspace(0, 1, h)[:, None]
        renders = [{"rgb": rgb, "camera": cam}]
        texture = bake_texture_uv(verts, faces, uv, tex, renders)
        return verts, faces, uv, tex, rgb, texture, cam

    def test_intra_square_gradient(self):
        _, faces, uv, tex, _, texture, _ = self._bake_gradient()
        # texels covered by face 0's triangle must NOT be one flat color
        # (the round-1 points fallback made them flat; VERDICT gap #2)
        from threestudio_3dgs_tpu.models.texture_bake import _uv_bary

        jj, ii = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
        px = np.stack([ii + 0.5, jj + 0.5], -1).reshape(-1, 2)
        inside = _uv_bary(px, np.broadcast_to(uv[0], (256, 3, 2))).min(-1) > 0.05
        texels = texture[px[inside, 1].astype(int), px[inside, 0].astype(int)]
        assert texels.std(axis=0).max() > 0.05

    def test_bake_round_trip(self):
        verts, faces, uv, tex, rgb, texture, cam = self._bake_gradient()
        # re-rasterize and compare the texture lookup with the source image
        out = rasterize_triangles_camera(verts, faces, cam)
        fid = np.asarray(out.face_id)
        bary = np.asarray(out.bary)
        hit = fid >= 0
        puv = (bary[hit][..., None] * uv[fid[hit]]).sum(1)
        a = np.clip(np.floor(puv[:, 0]).astype(int), 0, tex - 1)
        b = np.clip(np.floor(puv[:, 1]).astype(int), 0, tex - 1)
        err = np.abs(texture[b, a] - rgb[hit])
        # one texel averages several neighbor pixels of the gradient
        assert np.median(err) < 0.05
        assert err.mean() < 0.1

    def test_occluded_face_keeps_init(self):
        h = w = 64
        cam = front_camera(h, w)
        # quad at z=-3 fully hidden behind a bigger quad at z=-2
        vf, ff = quad_mesh(z=-3.0, half=0.3)
        vn, fn = quad_mesh(z=-2.0, half=1.0)
        verts = np.concatenate([vf, vn])
        faces = np.concatenate([ff, fn + 4]).astype(np.int32)
        tex, uv = build_triangle_uv_atlas(len(faces), square_size=16)
        rgb = np.ones((h, w, 3), np.float32)  # white everywhere
        init = np.full((tex, tex, 3), 0.25, np.float32)
        texture = bake_texture_uv(verts, faces, uv, tex, [
            {"rgb": rgb, "camera": cam}
        ], init)
        # hidden faces 0/1 keep the init color at their texel centers
        c0 = uv[0].mean(0).astype(int)
        c2 = uv[2].mean(0).astype(int)
        assert np.allclose(texture[c0[1], c0[0]], 0.25)
        # visible face texels got white
        assert np.allclose(texture[c2[1], c2[0]], 1.0, atol=1e-5)

    def test_save_obj(self, tmp_path):
        verts, faces, uv, tex, _, texture, _ = self._bake_gradient()
        path = str(tmp_path / "mesh.obj")
        save_textured_obj_uv(path, verts, faces, uv, tex, texture)
        text = open(path).read()
        assert text.count("\nvt ") == 3 * len(faces)
        assert "mtllib" in text


class TestInitFromSH:
    def test_densest_gaussian_wins(self):
        # one face, 3 gaussians at the bary-center table with distinct colors
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        faces = np.array([[0, 1, 2]], np.int32)
        tex, uv = build_triangle_uv_atlas(1, square_size=16)
        bary_tab = np.array(
            [[1 / 2, 1 / 4, 1 / 4], [1 / 4, 1 / 2, 1 / 4], [1 / 4, 1 / 4, 1 / 2]],
            np.float32,
        )
        centers = bary_tab @ verts
        inv_rot = np.broadcast_to(np.eye(3, dtype=np.float32) / 0.05, (3, 3, 3))
        colors = np.eye(3, dtype=np.float32)  # R, G, B
        texture = init_texture_from_sh(
            verts, faces, uv, tex, 16, centers, inv_rot.copy(), colors
        )
        # the texel at each bary center must carry that gaussian's color
        from threestudio_3dgs_tpu.models.texture_bake import _uv_bary  # noqa

        for g in range(3):
            puv = (bary_tab[g][:, None] * uv[0]).sum(0)
            texel = texture[int(puv[1]), int(puv[0])]
            assert texel[g] == pytest.approx(1.0), (g, texel)
