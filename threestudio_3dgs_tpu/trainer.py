"""Training loop: the ~300-line JAX replacement for the Lightning Trainer +
launch.py the reference depends on (SURVEY.md L1, design delta 4).

Drives the train/val/test/predict/export lifecycle from an ExperimentConfig:
  * train: host loop; per-step batches from the data module, jitted train
    step, interval-gated validation / checkpointing
  * val/test: fixed-circle renders -> image grids -> mp4
  * export: geometry export (PLY always; mesh extraction via the exporter)
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np

from .utils.ckpt import load_checkpoint, save_checkpoint
from .utils.config import ExperimentConfig, dump_config
from .utils.registry import find
from .utils.saving import save_image_grid, save_img_sequence


class Trainer:
    def __init__(self, cfg: ExperimentConfig):
        self.cfg = cfg
        self.data = find(cfg.data_type)(cfg.data, seed=cfg.seed)
        system_cfg = dict(cfg.system)
        self.system = find(cfg.system_type)(system_cfg)
        # temporal systems condition their guidance on the video frames
        if hasattr(self.system, "attach_video_frames") and hasattr(
            self.data, "rgbs"
        ):
            self.system.attach_video_frames(self.data.rgbs)
        self.max_steps = int(cfg.trainer.get("max_steps", 1000))
        self.val_interval = cfg.trainer.get("val_check_interval", None)
        self.log_every = int(cfg.trainer.get("log_every_n_steps", 10))
        ckpt_cfg = cfg.checkpoint or {}
        self.ckpt_every = ckpt_cfg.get("every_n_train_steps", None)
        # save_top_k == -1 (the reference default): keep every interval
        # checkpoint as epoch=N-step=N.ckpt, not just last.ckpt
        self.ckpt_keep_all = int(ckpt_cfg.get("save_top_k", 0) or 0) == -1
        self.save_dir = cfg.trial_dir or "outputs/debug"
        os.makedirs(self.save_dir, exist_ok=True)
        self.state = None
        self.step = 0
        self.metrics_log = []
        self._metrics_file = None
        self.wandb_run = self._init_wandb(cfg)
        # failure detection / recovery (SURVEY.md section 5: absent in the
        # reference -- crashes just die; here device faults trigger an
        # emergency checkpoint and bounded in-place retries, and a NaN
        # watchdog aborts with a diagnostic instead of training on garbage.
        # The watchdog samples LOGGED steps only: checking every step would
        # force a per-step host sync, 100-600 ms each over the tunnel)
        ft = cfg.trainer.get("fault_tolerance", {}) or {}
        self.ft_max_retries = int(ft.get("max_retries", 1))
        self.ft_retry_wait_s = float(ft.get("retry_wait_s", 10.0))
        self.ft_nan_patience = int(ft.get("nan_patience", 3))
        self._nan_streak = 0
        self.mesh = self._build_mesh(cfg)
        if self.mesh is not None and hasattr(self.system, "set_mesh"):
            self.system.set_mesh(self.mesh)
            print(
                f"[trainer] data-parallel over {self.mesh.shape['data']} "
                f"device(s): {self.mesh}",
                flush=True,
            )

    @staticmethod
    def _build_mesh(cfg: ExperimentConfig):
        """Camera-sharded data-parallel mesh for training.

        `trainer.devices` semantics follow the reference's Lightning flag
        (reference launch.py --gpu / trainer.devices): "auto"/unset uses every
        local device (engaging shard_map only when there is more than one);
        an integer N requests exactly the first N devices -- N=1 forces the
        1-device mesh path (useful to validate shard_map on a single chip).
        """
        devices = cfg.trainer.get("devices", "auto")
        all_devs = jax.devices()
        if devices in ("auto", None, ""):
            n = len(all_devs)
            if n <= 1:
                return None  # bit-identical single-device behavior
        else:
            n = int(devices)
            if n <= 0:
                return None
            if n > len(all_devs):
                raise ValueError(
                    f"trainer.devices={n} but only {len(all_devs)} "
                    f"jax devices are visible"
                )
        from jax.sharding import Mesh

        return Mesh(np.asarray(all_devs[:n]), ("data",))

    def _init_wandb(self, cfg: ExperimentConfig):
        """Optional wandb logging (reference configs' `loggers.wandb` block,
        reference configs/gaussian_splatting.yaml:71-75); silently off when
        disabled or the package is absent (this environment has no egress)."""
        # the reference nests `loggers` under system:
        # (reference configs/gaussian_splatting.yaml:71-75); accept both
        loggers = cfg.loggers or (cfg.system or {}).get("loggers", {}) or {}
        wb_cfg = loggers.get("wandb", {})
        if not wb_cfg.get("enable", False):
            return None
        try:
            import wandb

            return wandb.init(
                project=wb_cfg.get("project", "threestudio-3dgs-tpu"),
                name=wb_cfg.get("name", cfg.trial_name) or cfg.trial_name,
                config=dict(cfg.__dict__),
                dir=self.save_dir,
            )
        except Exception as e:  # pragma: no cover - wandb not installed here
            print(f"[trainer] wandb disabled ({e})", flush=True)
            return None

    def _log_metrics(self, row: Dict[str, Any]) -> None:
        """Crash-safe observability: append to save/metrics.jsonl immediately
        (the reference relies on Lightning's logger; a mid-run crash there
        loses nothing either)."""
        self.metrics_log.append(row)
        if self._metrics_file is None:
            self._metrics_file = open(
                os.path.join(self.save_dir, "metrics.jsonl"), "a"
            )
        self._metrics_file.write(json.dumps(row) + "\n")
        self._metrics_file.flush()
        if self.wandb_run is not None:
            self.wandb_run.log(row, step=row.get("step"))

    # -- lifecycle -----------------------------------------------------------
    def fit(self, resume: Optional[str] = None):
        dump_config(self.cfg, os.path.join(self.save_dir, "parsed.yaml"))
        if resume:
            self.state, self.step = load_checkpoint(resume)
            print(f"[trainer] resumed from {resume} at step {self.step}")
        if self.state is None:
            self.state = self.system.init_state(self.cfg.seed)
        key = jax.random.PRNGKey(self.cfg.seed)

        t_start = time.time()
        retries = 0
        while self.step < self.max_steps:
            batch = self.data.train_batch(self.step)
            key, sub = jax.random.split(key)
            try:
                self.state, logs = self.system.train_step(
                    self.state, batch, self.step, sub
                )
            except (TypeError, ValueError, AttributeError, KeyError,
                    IndexError, AssertionError):
                # deterministic programming errors: retrying only delays the
                # stack trace
                raise
            except Exception as e:  # device fault / tunnel drop / OOM
                name = type(e).__name__
                retries += 1
                crash_path = os.path.join(
                    self.save_dir, "ckpts", "crash.ckpt.npz"
                )
                try:
                    save_checkpoint(crash_path, self.state, self.step)
                    print(
                        f"[trainer] step {self.step} failed ({name}: {e}); "
                        f"emergency checkpoint -> {crash_path}",
                        flush=True,
                    )
                except Exception as e2:  # state itself may be poisoned
                    print(
                        f"[trainer] step {self.step} failed ({name}) and the "
                        f"emergency checkpoint also failed ({e2})",
                        flush=True,
                    )
                if retries > self.ft_max_retries:
                    raise
                print(
                    f"[trainer] retry {retries}/{self.ft_max_retries} "
                    f"in {self.ft_retry_wait_s:.0f}s",
                    flush=True,
                )
                time.sleep(self.ft_retry_wait_s)
                continue
            retries = 0
            self.step += 1

            if self.step % self.log_every == 0 or self.step == 1:
                logs_host = {
                    k: float(np.asarray(v)) for k, v in jax.device_get(logs).items()
                }
                total = logs_host.get("train/loss_total")
                if total is not None and not np.isfinite(total):
                    self._nan_streak += 1
                    if self._nan_streak >= self.ft_nan_patience:
                        self.save_ckpt("nan.ckpt.npz")
                        raise FloatingPointError(
                            f"train/loss_total non-finite on "
                            f"{self._nan_streak} consecutive LOGGED steps "
                            f"(step {self.step}, sampled every "
                            f"{self.log_every}); state saved to nan.ckpt.npz"
                        )
                else:
                    self._nan_streak = 0
                logs_host["step"] = self.step
                logs_host["wall_s"] = round(time.time() - t_start, 1)
                self._log_metrics(logs_host)
                msg = " ".join(
                    f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                    for k, v in sorted(logs_host.items())
                )
                print(f"[trainer] {msg}", flush=True)

            if self.val_interval and self.step % int(self.val_interval) == 0:
                self.validate()
            if self.ckpt_every and self.step % int(self.ckpt_every) == 0:
                if self.ckpt_keep_all:
                    self.save_ckpt(f"step{self.step}.ckpt.npz")
                self.save_ckpt("last.ckpt.npz")

        self.save_ckpt("last.ckpt.npz")
        if self._metrics_file is not None:
            self._metrics_file.close()
            self._metrics_file = None
        if self.wandb_run is not None:
            self.wandb_run.finish()
        return self.state

    def validate(self):
        views = self.data.val_views()
        out_dir = os.path.join(self.save_dir, "save")
        self.system.save_validation_images(out_dir, self.state, views, self.step)
        print(f"[trainer] validation images -> {out_dir}", flush=True)

    def test(self):
        views = self.data.test_views()
        out_dir = os.path.join(self.save_dir, "save", f"it{self.step}-test")
        os.makedirs(out_dir, exist_ok=True)
        outs = self.system.render_views(self.state, views)
        for view, out in zip(views, outs):
            save_image_grid(
                os.path.join(out_dir, f"{view['index']}.png"), [out["comp_rgb"][0]]
            )
        video = save_img_sequence(
            os.path.join(self.save_dir, "save", f"it{self.step}-test.mp4"),
            out_dir,
            r"(\d+)\.png",
            fps=30,
        )
        # dump the point cloud alongside (reference test_step saves a PLY)
        ply_path = os.path.join(self.save_dir, "save", "point_cloud.ply")
        self.system.geometry.save_ply(self.state.gauss, ply_path)
        print(f"[trainer] test renders -> {out_dir}; video={video}; ply={ply_path}")

    def predict(self):
        """--predict: textured-mesh extraction for SuGaR systems (reference
        system/base.py:72-323 predict path); falls back to test renders for
        systems without a predict surface."""
        if not hasattr(self.system, "predict_textured_mesh"):
            print("[trainer] system has no predict path; running test()")
            return self.test()
        if hasattr(self.data, "predict_views"):
            views = self.data.predict_views()
        else:
            views = self.data.test_views()
        out_dir = os.path.join(self.save_dir, "save", f"it{self.step}-predict")
        os.makedirs(out_dir, exist_ok=True)
        out_path = os.path.join(out_dir, "textured_mesh.obj")
        result = self.system.predict_textured_mesh(self.state, views, out_path)
        print(f"[trainer] predict (textured mesh) -> {result}")
        return result

    def export(self):
        exporter_type = getattr(self.system.cfg, "exporter_type", None) or (
            "gaussian-mesh-exporter"
        )
        exporter = find(exporter_type)(
            getattr(self.system.cfg, "exporter", {}), geometry=self.system.geometry
        )
        out_dir = os.path.join(self.save_dir, "save", "export")
        os.makedirs(out_dir, exist_ok=True)
        outputs = exporter(self.state.gauss, out_dir)
        print(f"[trainer] export -> {out_dir}: {outputs}")

    def save_ckpt(self, name: str):
        path = os.path.join(self.save_dir, "ckpts", name)
        save_checkpoint(path, self.state, self.step)
        print(f"[trainer] checkpoint -> {path}", flush=True)
