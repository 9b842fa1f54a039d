"""Config-system tests: scheduled hyperparameters, interpolation, resolvers,
dotlist overrides (SURVEY.md section 5 'Config / flag system')."""

import dataclasses
import math

import pytest

from threestudio_3dgs_tpu.utils.config import (
    C,
    C_max,
    apply_dotlist,
    load_config,
    parse_structured,
    resolve,
)


class TestC:
    def test_scalar_passthrough(self):
        assert C(0.01, 0, 500) == 0.01
        assert C(5, 0, 0) == 5

    def test_linear_4list(self):
        # [start_step, start_value, end_value, end_step]
        assert C([0, 1.0, 0.0, 100], 0, 50) == pytest.approx(0.5)
        assert C([0, 1.0, 0.0, 100], 0, 200) == 0.0
        assert C([100, 1.0, 0.0, 200], 0, 50) == 1.0

    def test_linear_3list_prepends_zero_start(self):
        assert C([1.0, 0.0, 100], 0, 50) == pytest.approx(0.5)

    def test_exp(self):
        v = C([0, 1e-1, 1e-3, 100], 0, 50, interpolation="exp")
        assert v == pytest.approx(1e-2, rel=1e-6)

    def test_interval(self):
        sched = [100, 1.0, 0.0, 200]
        assert C(sched, 0, 150, interpolation="interval") == 1.0
        assert C(sched, 0, 50, interpolation="interval") == 0.0
        assert C(sched, 0, 250, interpolation="interval") == 0.0

    def test_epoch_keyed_by_float_end_step(self):
        assert C([0, 1.0, 0.0, 10.0], 5, 99999) == pytest.approx(0.5)

    def test_cmax(self):
        assert C_max([0, 0.0, 2.0, 100]) == 2.0
        assert C_max(0.0) == 0.0


class TestResolve:
    def test_reference_interpolation(self):
        cfg = {"trainer": {"max_steps": 5000}, "system": {"until": "${trainer.max_steps}"}}
        out = resolve(cfg)
        assert out["system"]["until"] == 5000

    def test_rmspace(self):
        out = resolve({"name": "${rmspace:a hamburger,_}"})
        assert out["name"] == "a_hamburger"

    def test_nested_resolver(self):
        cfg = {"prompt": "a dog", "name": "gs-${rmspace:${prompt},_}"}
        assert resolve(cfg)["name"] == "gs-a_dog"

    def test_gt0_not_cmaxgt0(self):
        cfg = {
            "a": "${gt0:0.5}",
            "b": "${not:${gt0:0.0}}",
            "c": "${cmaxgt0:[0, 0.0, 2.0, 100]}",
        }
        out = resolve(cfg)
        assert out["a"] is True and out["b"] is True and out["c"] is True


class TestOverridesAndParse:
    def test_dotlist(self):
        cfg = {"system": {"loss": {"lambda_sds": 1.0}}}
        out = apply_dotlist(cfg, ["system.loss.lambda_sds=0.1", "trainer.max_steps=10"])
        assert out["system"]["loss"]["lambda_sds"] == 0.1
        assert out["trainer"]["max_steps"] == 10

    def test_parse_structured_nested_and_extra(self):
        @dataclasses.dataclass
        class Inner:
            x: int = 1

        @dataclasses.dataclass
        class Outer:
            inner: Inner = dataclasses.field(default_factory=Inner)
            y: float = 0.0

        obj = parse_structured(Outer, {"inner": {"x": 5}, "y": 2.0, "unknown": "kept"})
        assert obj.inner.x == 5 and obj.y == 2.0
        assert obj.extra == {"unknown": "kept"}

    def test_load_config_roundtrip(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text(
            "name: test-${rmspace:a b,_}\n"
            "data_type: random-camera-datamodule\n"
            "trainer:\n  max_steps: 100\n"
            "system:\n  until: ${trainer.max_steps}\n"
        )
        cfg = load_config(str(p), overrides=["trainer.max_steps=7", "seed=3"])
        assert cfg.name == "test-a_b"
        assert cfg.trainer["max_steps"] == 7
        # interpolation resolves before overrides are re-resolved; the
        # override applies to max_steps, interpolations see the merged dict
        assert cfg.seed == 3
