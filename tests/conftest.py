"""Test harness config: force a virtual 8-device CPU mesh before JAX loads.

This is the TPU-equivalent of testing multi-node code without a cluster
(SURVEY §4): every sharding/collective path compiles and runs on 8 virtual
CPU devices.
"""

import os
import sys

# Force CPU regardless of the ambient platform (the driver environment
# pins JAX_PLATFORMS=axon for the real chip; tests always use the mesh).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize imports jax at interpreter start, so the
# env vars above can be too late — override through jax.config as well
# (safe as long as no backend has been initialized yet).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def acdc_root():
    from wsl4mis_tpu.data import default_acdc_root

    root = default_acdc_root()
    if not os.path.isdir(root):
        pytest.skip("ACDC data not available")
    return root


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
