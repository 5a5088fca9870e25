"""Multi-host (DCN) scaffolding.

The reference is strictly single-process (SURVEY.md §2.3: serial Python loop,
no torch.distributed).  The TPU-native design scales over pods the cheap way
for this workload: **videos are embarrassingly parallel**, so the dataset is
sharded across hosts over DCN (zero cross-host traffic during extraction)
while each host's frame/pair batches run data-parallel over its local ICI
mesh.  Cross-host communication happens only at the end — a
``process_allgather`` of the tiny (n_videos, 35203) feature rows — and for
MLP training, where gradients ride a global 'data' axis laid out hosts-major
(DCN) x local-devices-minor (ICI) so per-step collectives stay on ICI within
each DCN replica group.

Run one process per host with::

    relaxtpu-worker:  initialize(coordinator, num_processes, process_id)
"""

from __future__ import annotations

import logging

import numpy as np

log = logging.getLogger("relaxtpu.parallel.distributed")


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """``jax.distributed.initialize`` wrapper (idempotent, env-var fallback).

    On TPU pods the three arguments auto-detect; on CPU/GPU clusters pass
    them explicitly (coordinator = host:port of process 0).
    """
    import jax

    # NOTE: must run before any other jax call — touching the backend (even
    # jax.process_count()) initializes it single-process and makes
    # distributed init impossible.
    try:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
    except RuntimeError as e:
        if "already" in str(e).lower():  # idempotent double-init
            log.info("jax.distributed already initialized")
            return
        raise


def shard_videos(items, process_index: int | None = None, process_count: int | None = None) -> list:
    """This host's video subset: round-robin over processes (DCN sharding).

    Round-robin (not contiguous blocks) balances long/short videos that
    cluster in dataset order.
    """
    import jax

    pid = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    return list(items)[pid::n]


def allgather_video_features(
    local_indices: np.ndarray, local_vecs: np.ndarray, n_videos: int
) -> np.ndarray:
    """(n_videos, D) matrix assembled from every host's rows.

    One DCN allgather of the tiny feature rows; feature extraction itself
    never crosses hosts.
    """
    import jax
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        out = np.zeros((n_videos, local_vecs.shape[1]), local_vecs.dtype)
        out[np.asarray(local_indices, int)] = local_vecs
        return out
    # pad to the max local count so gather shapes are uniform across hosts
    counts = multihost_utils.process_allgather(np.asarray([len(local_indices)]))
    max_n = int(np.max(counts))
    pad = max_n - len(local_indices)
    idx = np.concatenate([np.asarray(local_indices, int), -np.ones(pad, int)])
    vecs = np.concatenate(
        [local_vecs, np.zeros((pad, local_vecs.shape[1]), local_vecs.dtype)]
    )
    all_idx = multihost_utils.process_allgather(idx)      # (P, max_n)
    all_vecs = multihost_utils.process_allgather(vecs)    # (P, max_n, D)
    out = np.zeros((n_videos, local_vecs.shape[1]), local_vecs.dtype)
    for p in range(all_idx.shape[0]):
        valid = all_idx[p] >= 0
        out[all_idx[p][valid]] = all_vecs[p][valid]
    return out


def global_data_mesh(n_model: int = 1):
    """Global ('data', 'model') mesh laid out hosts-major over DCN.

    ``mesh_utils.create_device_mesh`` keeps each host's devices contiguous on
    the data axis, so the batch shards touching a given host's HBM are fed by
    that host and gradient reductions stay ICI-local per DCN hop.
    """
    import jax
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    n = jax.device_count()
    devices = mesh_utils.create_device_mesh((n // n_model, n_model))
    return Mesh(devices, ("data", "model"))
