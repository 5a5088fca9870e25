"""Mesh construction and sharding helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices=None,
    platform: str | None = None,
) -> Mesh:
    """('data', 'model') mesh over the available devices.

    Defaults to all devices on the data axis (feature extraction and MLP
    training are batch-dominated; the model axis exists for sharding the
    35,203-wide fc1 layer when wanted).  ``platform`` selects a backend
    explicitly (e.g. 'cpu' for the virtual host mesh used in tests/dry runs;
    the axon TPU plugin ignores JAX_PLATFORMS, so explicit selection is the
    reliable path).
    """
    if devices is None:
        devices = jax.devices(platform) if platform else jax.devices()
        needed = (n_data or 1) * n_model
        if platform is None and n_data is not None and len(devices) < needed:
            # The default backend cannot satisfy the requested mesh (e.g. a
            # single tunneled TPU on this host).  Fall back to the virtual
            # CPU host platform — the same preference dryrun_multichip
            # documents — so multi-device code paths stay exercisable.
            try:
                cpus = jax.devices("cpu")
            except RuntimeError:
                cpus = []
            if len(cpus) >= needed:
                import logging

                logging.warning(
                    "make_mesh: default backend has %d device(s) < %d "
                    "requested; using the virtual CPU host mesh",
                    len(devices), needed,
                )
                devices = cpus
    devices = np.asarray(devices)
    if n_data is None:
        n_data = devices.size // n_model
    needed = n_data * n_model
    if devices.size < needed:
        raise ValueError(
            f"mesh needs {needed} devices (data={n_data} x model={n_model}); "
            f"only {devices.size} available"
        )
    grid = devices[:needed].reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Pad the leading dim to a multiple of the data axis and device_put.

    Returns (padded arrays, real_count) — callers slice results back.
    """
    n = mesh.shape["data"]
    out = []
    real = None
    for a in arrays:
        real = len(a) if real is None else real
        pad = (-len(a)) % n
        if pad:
            a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)], axis=0)
        out.append(jax.device_put(a, data_sharding(mesh)))
    return (*out, real)
