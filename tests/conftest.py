import os

# Run the test suite on a virtual 8-device CPU mesh with float64 enabled so
# golden tests against float64 reference formulas are exact, and multi-device
# sharding tests run without TPU hardware. The sandbox's sitecustomize forces
# JAX_PLATFORMS=axon, so the platform must be overridden via jax.config after
# import (env vars alone are not enough).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


DATA_DIR = "/root/reference/data"


@pytest.fixture(scope="session")
def sim_data_dir():
    return os.path.join(DATA_DIR, "simulated")
