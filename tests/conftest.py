"""Test harness config: run everything on a virtual 8-device CPU mesh.

Must set env vars BEFORE jax initializes its backends, so this lives at the
top of conftest and tests must not import jax at collection time earlier than
this file.
"""
import os

# Force CPU: the environment pre-sets JAX_PLATFORMS=axon (real TPU); the unit
# suite runs on a virtual 8-device CPU mesh for determinism + multi-chip tests.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)
