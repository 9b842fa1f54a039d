"""4D spacetime tests: timed evaluation semantics, spline motion, deformation
field identity-at-init, and the gs4d end-to-end smoke run."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from threestudio_3dgs_tpu.models.deformation import (
    DeformationConfig,
    deformation_apply,
    init_deformation_params,
)
from threestudio_3dgs_tpu.models.spacetime import (
    SpacetimeConfig,
    SpacetimeGaussianField,
    get_timed_all,
)

CONFIG = os.path.join(
    os.path.dirname(__file__), "..", "threestudio_3dgs_tpu", "configs", "gs4d.yaml"
)


def small_field(**kw):
    defaults = dict(
        init_num_pts=64, max_num=256, capacity=128, sh_degree=0, num_frames=6
    )
    defaults.update(kw)
    return SpacetimeGaussianField(SpacetimeConfig(**defaults))


class TestSpacetimeModel:
    def test_polynomial_motion(self):
        field = small_field(enable_spacetime=True, enable_dynamic=False)
        state = field.init_state(0)
        p = state.params
        # motion coefficients: pure linear drift along +x
        motion = np.zeros((128, 9), np.float32)
        motion[:, 0] = 1.0  # rank-1 x coefficient
        state = state.replace(params=p.replace(motion=jnp.asarray(motion)))
        xyz0, *_ = field.get_timed_all(state, 0.0, 0)
        xyz_half, *_ = field.get_timed_all(state, 0.5, 0)
        delta = np.asarray(xyz_half - xyz0)[:64]
        np.testing.assert_allclose(delta[:, 0], 0.5, atol=1e-5)
        np.testing.assert_allclose(delta[:, 1:], 0.0, atol=1e-5)

    def test_dynamic_deltas(self):
        field = small_field(enable_spacetime=False, enable_dynamic=True)
        state = field.init_state(0)
        d = np.zeros((128, 6, 3), np.float32)
        d[:, 3, 2] = 0.7  # frame 3 moves +z
        state = state.replace(
            params=state.params.replace(delta_xyz=jnp.asarray(d))
        )
        xyz3, *_ = field.get_timed_all(state, 0.5, 3)
        xyz0, *_ = field.get_timed_all(state, 0.0, 0)
        np.testing.assert_allclose(
            np.asarray(xyz3 - xyz0)[:64, 2], 0.7, atol=1e-5
        )

    def test_colors_are_sh2rgb_of_dc(self):
        # the reference's spacetime quirk: colors_precomp = SH2RGB(f_dc)
        field = small_field()
        state = field.init_state(0)
        _, _, _, _, colors = field.get_timed_all(state, 0.0, 0)
        from threestudio_3dgs_tpu.ops.sh import sh_to_rgb

        expect = sh_to_rgb(state.params.features_dc[:, 0, :])
        np.testing.assert_allclose(np.asarray(colors), np.asarray(expect), atol=1e-6)

    def test_spline_mode_static_knots(self):
        # with zero motion the spline reproduces the static positions
        field = small_field(
            use_spline=True, enable_dynamic=True, enable_spacetime=False,
            num_frames=8,
        )
        state = field.init_state(0)
        xyz_t, scales, rots, opac, colors = field.get_timed_all(state, 0.5, 0)
        np.testing.assert_allclose(
            np.asarray(xyz_t)[:64], np.asarray(state.params.xyz)[:64], atol=1e-4
        )

    def test_densify_extends_temporal_params(self):
        import jax.random as jr
        from threestudio_3dgs_tpu.models.gaussian_field import densify_op

        field = small_field(enable_spacetime=True)
        state = field.init_state(0)
        accum = np.zeros(128, np.float32)
        accum[:5] = 10.0
        state = state.replace(
            xyz_grad_accum=jnp.asarray(accum), denom=jnp.ones(128)
        )
        out = densify_op(state, jr.PRNGKey(0), jnp.float32(0.01), jnp.float32(1e9))
        assert int(out.n_alive) == 64 + 5
        # cloned rows carry the motion/omega/trbf rows too
        np.testing.assert_allclose(
            np.asarray(out.params.motion)[64:69],
            np.asarray(state.params.motion)[:5],
        )


class TestDeformation:
    def test_identity_at_init_with_res_heads(self, rng):
        cfg = DeformationConfig(use_res=True, grid_resolution=(8, 8, 8, 4))
        params = init_deformation_params(jax.random.PRNGKey(0), cfg)
        xyz = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32) * 0.5)
        scaling = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
        rotation = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32))
        opacity = jnp.asarray(rng.normal(size=(32, 1)).astype(np.float32))
        t = jnp.zeros(32)
        nx, ns, nr, no = deformation_apply(
            params, cfg, xyz, scaling, rotation, opacity, t
        )
        np.testing.assert_allclose(np.asarray(nx), np.asarray(xyz), atol=1e-6)
        np.testing.assert_allclose(np.asarray(nr), np.asarray(rotation), atol=1e-6)

    def test_gradients_flow(self, rng):
        cfg = DeformationConfig(use_res=False, grid_resolution=(8, 8, 8, 4))
        params = init_deformation_params(jax.random.PRNGKey(0), cfg)
        xyz = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32) * 0.5)

        def loss(p):
            nx, _, _, _ = deformation_apply(
                p, cfg, xyz, jnp.zeros((16, 3)), jnp.zeros((16, 4)),
                jnp.zeros((16, 1)), jnp.zeros(16),
            )
            return jnp.sum(nx ** 2)

        g = jax.grad(loss)(params)
        total = sum(
            float(jnp.sum(jnp.abs(leaf))) for leaf in jax.tree_util.tree_leaves(g)
        )
        assert np.isfinite(total) and total > 0


class TestGs4dEndToEnd:
    def test_smoke(self, tmp_path):
        from threestudio_3dgs_tpu.utils.config import load_config
        from threestudio_3dgs_tpu.trainer import Trainer

        cfg = load_config(
            CONFIG,
            [
                f"exp_root_dir={tmp_path}",
                "trainer.max_steps=4",
                "trainer.val_check_interval=1000",
                "data.height=32",
                "data.width=32",
                "data.video_length=4",
                "data.num_frames=3",
                "data.random_camera.height=32",
                "data.random_camera.width=32",
                "data.random_camera.batch_size=1",
                "system.geometry.init_num_pts=128",
                "system.geometry.max_num=512",
                "system.geometry.capacity=640",
                "system.geometry.num_frames=5",
                "system.renderer.tile_size=16",
                "system.renderer.max_pairs=32768",
                "system.renderer.impl=jax",
                "system.freq.update_arap=2",
                "system.freq.inter_frame_reg=2",
                "system.freq.milestone_inter_frame_reg=0",
                "system.num_inter_frames=3",
                "system.guidance_2d_type=fake-sds-guidance",
                "system.guidance_2d={target_color: [0.5, 0.5, 0.5]}",
                "system.loss.lambda_sds_2d=0.05",
                "system.loss.lambda_lite_arap_reg=1.0",
                "system.loss.lambda_ref_gs=1.0",
                "checkpoint.every_n_train_steps=100",
            ],
        )
        trainer = Trainer(cfg)
        state = trainer.fit()
        assert len(trainer.metrics_log) > 0
        for row in trainer.metrics_log:
            assert np.isfinite(row["train/loss_total"]), row
        # the inter-frame substep fired (every 2 steps) with finite losses
        interf_rows = [
            r for r in trainer.metrics_log if "train/loss_interf_sds_2d" in r
        ]
        assert interf_rows, sorted(trainer.metrics_log[-1])
        assert all(np.isfinite(r["train/loss_interf_sds_2d"]) for r in interf_rows)
        # dynamic deltas received gradient updates
        assert float(jnp.sum(jnp.abs(state.gauss.params.delta_xyz))) > 0

    def test_motion_config_smoke(self, tmp_path):
        """gs4d_motion trains the POLYNOMIAL spacetime motion (reference
        configs/gs4d_motion.yaml:69-80: move/omega/trbf LRs) -- the motion
        coefficients must receive gradient updates through the Trainer."""
        import os

        from threestudio_3dgs_tpu.utils.config import load_config
        from threestudio_3dgs_tpu.trainer import Trainer

        cfg = load_config(
            os.path.join(os.path.dirname(CONFIG), "gs4d_motion.yaml"),
            [
                f"exp_root_dir={tmp_path}",
                "trainer.max_steps=3",
                "trainer.val_check_interval=1000",
                "data.height=32",
                "data.width=32",
                "data.video_length=4",
                "data.num_frames=3",
                "data.random_camera.height=32",
                "data.random_camera.width=32",
                "data.random_camera.batch_size=1",
                "system.geometry.init_num_pts=128",
                "system.geometry.max_num=512",
                "system.geometry.capacity=640",
                "system.geometry.num_frames=5",
                "system.renderer.tile_size=16",
                "system.renderer.max_pairs=32768",
                "system.renderer.impl=jax",
                "checkpoint.every_n_train_steps=100",
            ],
        )
        trainer = Trainer(cfg)
        state = trainer.fit()
        for row in trainer.metrics_log:
            assert np.isfinite(row["train/loss_total"]), row
        p_ = state.gauss.params
        assert p_.motion is not None and p_.motion.size
        assert float(jnp.sum(jnp.abs(p_.motion))) > 0  # polynomial motion moved

    def test_spline_smoke(self, tmp_path):
        """The SE(3)-spline motion config (driver config ladder item 5:
        gs4d_spline at multiple timesteps) runs through the Trainer."""
        import os

        from threestudio_3dgs_tpu.utils.config import load_config
        from threestudio_3dgs_tpu.trainer import Trainer

        spline_cfg = os.path.join(os.path.dirname(CONFIG), "gs4d_spline.yaml")
        cfg = load_config(
            spline_cfg,
            [
                f"exp_root_dir={tmp_path}",
                "trainer.max_steps=3",
                "trainer.val_check_interval=1000",
                "data.height=32",
                "data.width=32",
                "data.video_length=4",
                "data.num_frames=3",
                "data.random_camera.height=32",
                "data.random_camera.width=32",
                "data.random_camera.batch_size=1",
                "system.geometry.init_num_pts=128",
                "system.geometry.max_num=512",
                "system.geometry.capacity=640",
                "system.geometry.num_frames=5",
                "system.renderer.tile_size=16",
                "system.renderer.max_pairs=32768",
                "system.renderer.impl=jax",
                "checkpoint.every_n_train_steps=100",
            ],
        )
        trainer = Trainer(cfg)
        state = trainer.fit()
        for row in trainer.metrics_log:
            assert np.isfinite(row["train/loss_total"]), row
        # spline control-knot parameters moved
        p = state.gauss.params
        knot_like = [
            a for a in (p.delta_xyz, p.delta_rot) if a is not None and a.size
        ]
        assert knot_like and any(
            float(jnp.sum(jnp.abs(a))) > 0 for a in knot_like
        )


class TestGs4dStaticStage:
    def test_static_stage_density_reg_smoke(self, tmp_path):
        """gs4d_static (driver ladder config): the static stage applies the
        SuGaR surface regularizers (opacity binary + density regulation,
        reference configs/gs4d_static.yaml:130-131) before the 4D motion
        stage takes over."""
        import os

        from threestudio_3dgs_tpu.utils.config import load_config
        from threestudio_3dgs_tpu.trainer import Trainer

        cfg_path = os.path.join(os.path.dirname(CONFIG), "gs4d_static.yaml")
        cfg = load_config(
            cfg_path,
            [
                f"exp_root_dir={tmp_path}",
                "data.image_path=''",  # synthetic fallback image
                "trainer.max_steps=3",
                "trainer.val_check_interval=1000",
                "data.height=32",
                "data.width=32",
                "data.random_camera.height=32",
                "data.random_camera.width=32",
                "data.random_camera.batch_size=1",
                "data.random_camera.eval_height=32",
                "data.random_camera.eval_width=32",
                "system.geometry.init_num_pts=128",
                "system.geometry.max_num=512",
                "system.geometry.capacity=640",
                "system.renderer.tile_size=16",
                "system.renderer.max_pairs=16384",
                "system.renderer.impl=jax",
                "system.guidance_type=fake-sds-guidance",
                "system.guidance={target_color: [0.7, 0.3, 0.2]}",
                "system.sugar.n_samples_for_sdf_regularization=1024",
                # make the schedules active from step 0 at this tiny length
                "system.loss.lambda_opacity_binary=0.1",
                "system.loss.lambda_density_regulation=1.0",
                "system.loss.lambda_normal_regulation=1.0",
                "checkpoint.every_n_train_steps=100",
            ],
        )
        trainer = Trainer(cfg)
        trainer.fit()
        row = trainer.metrics_log[-1]
        for k in (
            "train/loss_total",
            "train/loss_opacity_binary",
            "train/loss_density_regulation",
            "train/loss_normal_regulation",
        ):
            assert k in row and np.isfinite(row[k]), (k, sorted(row))


class TestTemporalPly:
    def test_temporal_ply_roundtrip(self, tmp_path):
        """save_ply writes the reference's temporal attribute schema as
        FIRST-CLASS PLY vertex properties (motion_i / omega_i / trbf_* /
        delta_{x,y,z}_t{i} / delta_rot_{j}_t{i}, reference
        spacetime_gaussian.py:880-1117); values round-trip by name."""
        field = small_field(enable_spacetime=True, enable_dynamic=True)
        state = field.init_state(0)
        # nonzero values so the round-trip is meaningful
        rng = np.random.default_rng(3)
        p = state.params
        state = state.replace(
            params=p.replace(
                motion=jnp.asarray(
                    rng.normal(size=np.asarray(p.motion).shape).astype(np.float32)
                ),
                delta_xyz=jnp.asarray(
                    rng.normal(size=np.asarray(p.delta_xyz).shape).astype(
                        np.float32
                    )
                ),
            )
        )
        p = state.params
        alive = np.asarray(state.alive)
        path = str(tmp_path / "cloud.ply")
        field.save_ply(state, path)
        import os

        assert os.path.exists(path)

        from threestudio_3dgs_tpu.models import ply_io

        cols = ply_io.read_ply_table(path)
        # exact reference attribute name list (construct_list_of_attributes,
        # spacetime_gaussian.py:880-910), modulo the kept f_rest columns
        t_frames = np.asarray(p.delta_xyz).shape[1]
        expected = (
            [f"delta_{ax}_t{i}" for i in range(t_frames) for ax in "xyz"]
            + [f"delta_rot_{j}_t{i}" for i in range(t_frames) for j in range(4)]
            + ["trbf_center", "trbf_scale"]
            + [f"motion_{i}" for i in range(np.asarray(p.motion).shape[1])]
            + [f"omega_{i}" for i in range(np.asarray(p.omega).shape[1])]
        )
        for name in expected:
            assert name in cols, name
        m = np.asarray(p.motion)[alive]
        np.testing.assert_allclose(cols["motion_0"], m[:, 0], rtol=1e-6)
        np.testing.assert_allclose(
            cols["trbf_center"], np.asarray(p.trbf_center)[alive, 0], rtol=1e-6
        )
        d = np.asarray(p.delta_xyz)[alive]
        np.testing.assert_allclose(cols["delta_x_t0"], d[:, 0, 0], rtol=1e-6)
        np.testing.assert_allclose(cols["delta_z_t1"], d[:, 1, 2], rtol=1e-6)

        # structured loader reassembles the stacked arrays
        temporal = field.load_temporal_ply(path)
        np.testing.assert_allclose(temporal["motion"], m, rtol=1e-6)
        np.testing.assert_allclose(temporal["delta_xyz"], d, rtol=1e-6)
        np.testing.assert_allclose(
            temporal["delta_rot"], np.asarray(p.delta_rot)[alive], rtol=1e-6
        )
        np.testing.assert_allclose(
            temporal["omega"], np.asarray(p.omega)[alive], rtol=1e-6
        )

        # the base PLY itself loads back with matching xyz
        data = ply_io.load_gaussian_ply(path, sh_degree=0)
        np.testing.assert_allclose(
            data["xyz"], np.asarray(p.xyz)[alive], rtol=1e-6
        )

    def test_sidecar_option_kept(self, tmp_path):
        field = small_field(enable_spacetime=True, enable_dynamic=False)
        state = field.init_state(0)
        path = str(tmp_path / "cloud.ply")
        field.save_ply(state, path, sidecar=True)
        import os

        assert os.path.exists(path + ".temporal.npz")
        cols = field.load_extra(path + ".temporal.npz")
        assert "motion_0" in cols and "trbf_center" in cols
