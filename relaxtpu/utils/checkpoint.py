"""Model snapshot checkpointing (flat-npz pytree serialization).

Replaces ``torch.save(state_dict)`` (ref ``model_regression.py:714-716``);
feature ``.npy`` files remain the pipeline-level resume points
(``relaxtpu.data.store.FeatureStore``), mirroring the reference's implicit
per-video resume."""

from __future__ import annotations

import os

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat):
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_snapshot(path: str, snapshot) -> None:
    """Save a ModelSnapshot (params + batch_stats) as .npz."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = {}
    flat.update({f"params/{k}": v for k, v in _flatten(jax.device_get(snapshot.params)).items()})
    flat.update(
        {f"stats/{k}": v for k, v in _flatten(jax.device_get(snapshot.batch_stats)).items()}
    )
    np.savez(path, **flat)


def load_snapshot(path: str):
    from relaxtpu.model.train import ModelSnapshot

    data = np.load(path)
    params_flat = {k[len("params/"):]: data[k] for k in data.files if k.startswith("params/")}
    stats_flat = {k[len("stats/"):]: data[k] for k in data.files if k.startswith("stats/")}
    return ModelSnapshot(_unflatten(params_flat), _unflatten(stats_flat))
