"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference only exercised its DDP path on real GPUs via SLURM (SURVEY §4);
here every multi-device code path is testable hardware-free via XLA's host
platform device count.
"""

import os

# force: the shell env presets JAX_PLATFORMS=axon (the TPU tunnel) and the
# boot shim additionally sets jax.config.jax_platforms programmatically, so
# both the env var AND the config must be overridden; tests always run on the
# virtual CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
