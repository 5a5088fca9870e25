"""Test harness config: run everything on a virtual 8-device CPU mesh.

Must set env vars BEFORE jax initializes its backends, so this lives at the
top of conftest and tests must not import jax at collection time earlier than
this file.
"""
import os

# NOTE: the axon TPU plugin ignores JAX_PLATFORMS, so when a real TPU is
# attached the default backend stays TPU (conftest sets highest matmul
# precision so f32 parity tests pass on the MXU).  The host-device-count flag
# still creates 8 virtual CPU devices — multi-chip tests request them
# explicitly via jax.devices("cpu") / make_mesh(platform="cpu").
os.environ["JAX_PLATFORMS"] = "cpu"  # honored only when no axon TPU plugin
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
