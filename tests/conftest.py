"""Test configuration: run the suite on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware (the standard JAX
topology-faking trick; see SURVEY.md section 4).  Set RUN_ON_TPU=1 to run the
suite against real devices instead."""

import os

if not os.environ.get("RUN_ON_TPU"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # The axon TPU plugin ignores the JAX_PLATFORMS env var; the config update
    # is honored.  Must happen before any backend initialization.
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
