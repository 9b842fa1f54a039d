"""Multi-PROCESS worker for the multi-host data-parallel test (run by
test_multihost.py, one python process per fake host).

Each process owns 4 virtual CPU devices; jax.distributed.initialize + gloo
collectives stitch them into one 8-device global mesh -- the standard
multi-host topology-faking setup (SURVEY.md section 4).  The FULL dp train
step (camera-sharded batch, replicated Gaussians, psum gradient reduction)
runs one step; every process prints the loss and the update norm, which the
parent asserts are identical across processes (the psum crossed the
process boundary)."""

import os
import sys

proc_id = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from threestudio_3dgs_tpu.parallel.mesh import initialize_distributed

initialize_distributed(
    coordinator_address=f"localhost:{port}",
    num_processes=nproc,
    process_id=proc_id,
)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec

from threestudio_3dgs_tpu.data.uncond import (
    RandomCameraDataModuleConfig,
    RandomCameraSampler,
)
from threestudio_3dgs_tpu.parallel.data_parallel import make_dp_train_step
from threestudio_3dgs_tpu.parallel.mesh import make_mesh
from threestudio_3dgs_tpu.systems.base import to_device_batch
from threestudio_3dgs_tpu.utils.registry import find

height = width = 32
global_batch = 8

system = find("gaussian-splatting-system")(
    {
        "geometry_type": "gaussian-splatting",
        "geometry": {"init_num_pts": 256, "max_num": 1024, "capacity": 1024},
        "renderer_type": "diff-gaussian-rasterizer-advanced",
        "renderer": {"tile_size": 16, "max_pairs": 16384, "impl": "jax"},
        "guidance_type": "fake-sds-guidance",
        "guidance": {"target_color": [0.8, 0.2, 0.2]},
        "loss": {"lambda_sds": 1.0, "lambda_position": 1.0},
    }
)
state = system.init_state(0)

# every process samples the SAME global batch (seeded), then contributes its
# process-local camera rows -- the deterministic analog of a sharded loader
sampler = RandomCameraSampler(
    RandomCameraDataModuleConfig(
        batch_size=global_batch, height=height, width=width
    )
)
np.random.seed(0)
batch = to_device_batch(sampler.sample())

mesh = make_mesh(axis_names=("data",))  # all 8 global devices
assert mesh.shape["data"] == 8, mesh.shape
step = make_dp_train_step(system, mesh, height, width, global_batch)

sharded = NamedSharding(mesh, PartitionSpec("data"))
rows = slice(proc_id * (global_batch // nproc), (proc_id + 1) * (global_batch // nproc))
dev_batch = {}
for k, v in batch.items():
    if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == global_batch:
        local = np.asarray(v)[rows]
        dev_batch[k] = jax.make_array_from_process_local_data(
            sharded, local, v.shape
        )
    else:
        dev_batch[k] = v

sched = system.sched_scalars(0)
new_state, logs = step(state, dev_batch, jax.random.PRNGKey(0), sched)
jax.block_until_ready(new_state)

loss = float(np.asarray(jax.device_get(logs["train/loss_total"])))
delta = float(
    np.abs(
        np.asarray(jax.device_get(new_state.gauss.params.xyz))
        - np.asarray(jax.device_get(state.gauss.params.xyz))
    ).max()
)
print(f"RESULT proc={proc_id} loss={loss:.6f} delta={delta:.6e}", flush=True)
assert np.isfinite(loss)
assert delta > 0.0
