"""End-to-end training smoke tests (SURVEY.md section 4, level 3): N-step
runs per config family with deterministic fake guidance -- M3's minimum
viable milestone: the gaussian_splatting workload runs end to end."""

import os

import numpy as np
import jax
import pytest

from threestudio_3dgs_tpu.utils.config import load_config
from threestudio_3dgs_tpu.trainer import Trainer

CONFIG = os.path.join(
    os.path.dirname(__file__), "..", "threestudio_3dgs_tpu", "configs",
    "gaussian_splatting.yaml",
)

SMOKE_OVERRIDES = [
    "trainer.max_steps=8",
    "trainer.val_check_interval=8",
    "data.width=64",
    "data.height=64",
    "data.eval_height=64",
    "data.eval_width=64",
    "data.batch_size=2",
    "data.n_val_views=1",
    "data.n_test_views=4",
    "system.geometry.init_num_pts=256",
    "system.geometry.max_num=1024",
    "system.geometry.capacity=1536",
    "system.geometry.densify_from_iter=2",
    "system.geometry.densification_interval=4",
    "system.geometry.prune_from_iter=2",
    "system.geometry.prune_interval=4",
    "system.renderer.tile_size=16",
    "system.renderer.max_pairs=65536",
    "system.renderer.impl=jax",
    "system.guidance_type=fake-sds-guidance",
    "system.guidance={target_color: [0.8, 0.2, 0.2], guidance_scale: 3.0}",
    "checkpoint.every_n_train_steps=8",
]


class TestEndToEnd:
    def test_gaussian_splatting_smoke(self, tmp_path):
        cfg = load_config(
            CONFIG, SMOKE_OVERRIDES + [f"exp_root_dir={tmp_path}"]
        )
        trainer = Trainer(cfg)
        state = trainer.fit()
        # losses were logged and are finite
        assert len(trainer.metrics_log) > 0
        for row in trainer.metrics_log:
            assert np.isfinite(row["train/loss_total"]), row
        # gaussians still alive, stats accumulated then consumed
        assert int(state.gauss.n_alive) > 0
        # validation image written
        save_dir = os.path.join(trainer.save_dir, "save")
        assert any(f.endswith(".png") for f in os.listdir(save_dir))
        # checkpoint round-trip
        ckpt = os.path.join(trainer.save_dir, "ckpts", "last.ckpt.npz")
        assert os.path.exists(ckpt)
        from threestudio_3dgs_tpu.utils.ckpt import load_checkpoint

        state2, step2 = load_checkpoint(ckpt)
        assert step2 == 8
        np.testing.assert_allclose(
            np.asarray(state2.gauss.params.xyz),
            np.asarray(state.gauss.params.xyz),
        )

    def test_training_moves_toward_target(self, tmp_path):
        # with MSE guidance toward red, renders should get redder
        cfg = load_config(
            CONFIG,
            SMOKE_OVERRIDES
            + [
                f"exp_root_dir={tmp_path}",
                "trainer.max_steps=30",
                "trainer.val_check_interval=1000",
                "system.guidance_type=fake-mse-guidance",
                "system.loss.lambda_sds=1.0",
                "system.loss.lambda_tv_loss=0.0",
                "system.loss.lambda_depth_tv_loss=0.0",
                "system.loss.lambda_position=0.0",
                "system.geometry.densify_from_iter=100",
                "system.geometry.prune_from_iter=100",
            ],
        )
        trainer = Trainer(cfg)
        trainer.fit()
        first = trainer.metrics_log[0]["train/loss_sds"]
        last = trainer.metrics_log[-1]["train/loss_sds"]
        assert last < first * 0.9, (first, last)

    def test_test_and_export(self, tmp_path):
        cfg = load_config(
            CONFIG,
            SMOKE_OVERRIDES
            + [f"exp_root_dir={tmp_path}", "trainer.max_steps=2",
               "trainer.val_check_interval=1000"],
        )
        trainer = Trainer(cfg)
        trainer.fit()
        trainer.test()
        ply = os.path.join(trainer.save_dir, "save", "point_cloud.ply")
        assert os.path.exists(ply)
        trainer.export()
        export_dir = os.path.join(trainer.save_dir, "save", "export")
        assert os.path.exists(os.path.join(export_dir, "model.ply"))


def test_adaptive_pair_capacity(tmp_path):
    """Adaptive pair sizing: a tiny scene shrinks the static pair capacity
    to min_pairs (bucketed), training stays finite, and a demand above
    capacity grows it."""
    import jax
    import numpy as np
    from threestudio_3dgs_tpu.systems.base import BaseGaussianSystem as BaseSystem
    from threestudio_3dgs_tpu.utils.config import load_config
    from threestudio_3dgs_tpu.trainer import Trainer

    cfg = load_config(
        "threestudio_3dgs_tpu/configs/gaussian_splatting.yaml",
        overrides=[
            "trainer.max_steps=5",
            "trainer.val_check_interval=100",
            "data.height=64", "data.width=64", "data.batch_size=1",
            "system.guidance_type=fake-sds-guidance",
            "system.renderer.adaptive_max_pairs=true",
            "system.renderer.min_pairs=65536",
            f"exp_root_dir={tmp_path}",
        ],
    )
    tr = Trainer(cfg)
    old_every = BaseSystem._ADAPT_EVERY
    BaseSystem._ADAPT_EVERY = 2
    try:
        tr.system._BUCKET = 65536
        tr.fit()
        sys_ = tr.system
        # tiny 64^2 scene: capacity must have shrunk below the config ceiling
        assert sys_._capacity is not None
        assert sys_._capacity < sys_.renderer.cfg.max_pairs
        assert sys_._capacity >= 65536
        # growth path: pretend demand exceeded capacity
        sys_._pair_log = [(np.int32(sys_._capacity + 1000), np.int32(1000))]
        cap_before = sys_._capacity
        sys_._adapt_pair_capacity(sys_._ADAPT_EVERY)
        assert sys_._capacity > cap_before
    finally:
        BaseSystem._ADAPT_EVERY = old_every


COMMON_SMALL = [
    "trainer.max_steps=3",
    "trainer.val_check_interval=1000",
    "data.width=32",
    "data.height=32",
    "system.geometry.init_num_pts=128",
    "system.geometry.max_num=512",
    "system.geometry.capacity=512",
    "system.geometry.densify_from_iter=100000",
    "system.geometry.prune_from_iter=100000",
    "system.renderer.tile_size=16",
    "system.renderer.max_pairs=32768",
    "system.renderer.impl=jax",
    "system.guidance_type=fake-sds-guidance",
    "system.guidance={target_color: [0.8, 0.2, 0.2]}",
    "checkpoint.every_n_train_steps=100",
]


@pytest.mark.parametrize(
    "config_name,extra",
    [
        (
            "gaussian_splatting_background.yaml",
            ["data.batch_size=2", "data.eval_height=32", "data.eval_width=32",
             "data.n_val_views=1", "data.resolution_milestones=[]"],
        ),
        (
            "gaussian_splatting_shading.yaml",
            ["data.batch_size=2", "data.eval_height=32", "data.eval_width=32",
             "data.n_val_views=1", "data.resolution_milestones=[]",
             "system.material.ambient_only_steps=1"],
        ),
        (
            "gaussian_splatting_mvdream.yaml",
            ["data.batch_size=[4,4]", "data.eval_height=32",
             "data.eval_width=32", "data.resolution_milestones=[1]",
             "data.width=[32,32]", "data.height=[32,32]"],
        ),
        (
            "gaussian_splatting_zero123.yaml",
            ["data.image_path=''", "data.random_camera.height=32",
             "data.random_camera.width=32", "data.random_camera.batch_size=1",
             "data.random_camera.eval_height=32",
             "data.random_camera.eval_width=32"],
        ),
        (
            # regression: freq.milestone_sugar_reg interpolation + the sugar
            # block placement once made this config crash on step 1
            "gs_to_sugar.yaml",
            ["data.image_path=''",
             "data.height=[32,32,32]", "data.width=[32,32,32]",
             "data.random_camera.height=[32,32]",
             "data.random_camera.width=[32,32]",
             "data.random_camera.batch_size=1",
             "data.random_camera.eval_height=32",
             "data.random_camera.eval_width=32",
             "system.n_samples_for_sugar_sdf_reg=512",
             "system.sugar.n_samples_for_sdf_regularization=512"],
        ),
    ],
)
def test_config_family_smoke(tmp_path, config_name, extra):
    """Every text/image-to-3D config family trains through the Trainer with
    fake guidance (level-3 smoke per SURVEY.md section 4)."""
    cfg_path = os.path.join(os.path.dirname(CONFIG), config_name)
    cfg = load_config(
        cfg_path,
        COMMON_SMALL + list(extra) + [f"exp_root_dir={tmp_path}"],
    )
    trainer = Trainer(cfg)
    trainer.fit()
    assert trainer.step == 3
    for row in trainer.metrics_log:
        assert np.isfinite(row["train/loss_total"]), row


def test_cli_launch_train_and_export(tmp_path):
    """The launch CLI end-to-end as a subprocess: --train then --export."""
    import subprocess
    import sys

    overrides = COMMON_SMALL + [
        "data.batch_size=1",
        "data.eval_height=32",
        "data.eval_width=32",
        "data.n_val_views=1",
        "data.n_test_views=2",
        f"exp_root_dir={tmp_path}",
    ]
    # force the CPU backend: the axon TPU plugin ignores JAX_PLATFORMS=cpu
    # (PERF.md pitfalls), so strip its site dir from the subprocess path
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = os.pathsep.join(
        [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
         if p and "axon" not in p]
        + [os.path.join(os.path.dirname(__file__), "..")]
    )
    r = subprocess.run(
        [sys.executable, "-m", "threestudio_3dgs_tpu.launch",
         "--config", CONFIG, "--train", "--export"] + overrides,
        capture_output=True, text=True, timeout=600,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        env=env,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "checkpoint ->" in r.stdout
    assert "test renders ->" in r.stdout
    assert "export ->" in r.stdout
