"""Failure detection / recovery (SURVEY.md section 5: the reference has none
-- crashes just die).  The trainer must write an emergency checkpoint and
retry on transient device faults, give up after max_retries, and abort with a
diagnostic (plus checkpoint) when the loss goes non-finite."""

import os

import jax
import numpy as np
import pytest

from threestudio_3dgs_tpu.trainer import Trainer
from threestudio_3dgs_tpu.utils.config import load_config

CONFIG = os.path.join(
    os.path.dirname(__file__), "..", "threestudio_3dgs_tpu", "configs",
    "gaussian_splatting.yaml",
)

OVERRIDES = [
    "trainer.max_steps=4",
    "trainer.log_every_n_steps=1",
    "data.width=32",
    "data.height=32",
    "data.eval_height=32",
    "data.eval_width=32",
    "data.batch_size=1",
    "system.geometry.init_num_pts=64",
    "system.geometry.max_num=128",
    "system.geometry.capacity=128",
    "system.renderer.tile_size=16",
    "system.renderer.max_pairs=8192",
    "system.renderer.impl=jax",
    "system.guidance_type=fake-sds-guidance",
    "checkpoint.every_n_train_steps=100",
]


def _make_trainer(tmp_path, extra=()):
    cfg = load_config(
        CONFIG, list(OVERRIDES) + [f"exp_root_dir={tmp_path}"] + list(extra)
    )
    return Trainer(cfg)


def test_transient_fault_retries_and_recovers(tmp_path):
    trainer = _make_trainer(
        tmp_path, ["trainer.fault_tolerance={max_retries: 2, retry_wait_s: 0}"]
    )
    real_step = trainer.system.train_step
    calls = {"n": 0}

    def flaky_step(state, batch, step, key):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected device fault")
        return real_step(state, batch, step, key)

    trainer.system.train_step = flaky_step
    trainer.fit()
    assert trainer.step == 4  # all steps completed despite the fault
    crash = os.path.join(trainer.save_dir, "ckpts", "crash.ckpt.npz")
    assert os.path.exists(crash)


def test_fault_exhausts_retries(tmp_path):
    trainer = _make_trainer(
        tmp_path, ["trainer.fault_tolerance={max_retries: 1, retry_wait_s: 0}"]
    )

    def dead_step(state, batch, step, key):
        raise RuntimeError("persistent device fault")

    trainer.system.train_step = dead_step
    with pytest.raises(RuntimeError, match="persistent device fault"):
        trainer.fit()


def test_nan_watchdog_aborts(tmp_path):
    trainer = _make_trainer(
        tmp_path, ["trainer.fault_tolerance={nan_patience: 2}"]
    )
    real_step = trainer.system.train_step

    def nan_step(state, batch, step, key):
        state, logs = real_step(state, batch, step, key)
        logs = dict(logs)
        logs["train/loss_total"] = jax.numpy.float32(np.nan)
        return state, logs

    trainer.system.train_step = nan_step
    with pytest.raises(FloatingPointError, match="non-finite"):
        trainer.fit()
    assert os.path.exists(
        os.path.join(trainer.save_dir, "ckpts", "nan.ckpt.npz")
    )
