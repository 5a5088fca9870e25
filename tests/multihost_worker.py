"""2-process CPU worker for the multi-host (DCN) test.

Launched by tests/test_multihost.py in a sanitized env (no axon plugin,
JAX_PLATFORMS=cpu, 4 virtual devices per process).  Exercises:
distributed init -> video sharding -> feature-row allgather -> one global
dp-mesh MLP train step fed with per-host batch chunks.
"""
import os
import sys

import numpy as np


def main():
    coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    import jax

    from relaxtpu.parallel.distributed import (
        allgather_video_features,
        global_data_mesh,
        initialize,
        shard_videos,
    )

    initialize(coordinator, num_procs, pid)
    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    # --- DCN video sharding: disjoint round-robin cover
    videos = list(range(10))
    mine = shard_videos(videos)
    assert mine == videos[pid::num_procs], mine

    # --- feature-row allgather: every host ends with the full matrix
    rng = np.random.default_rng(0)  # same on both: rows identified by index
    full = rng.normal(size=(10, 16)).astype(np.float32)
    local = full[np.asarray(mine)]
    got = allgather_video_features(np.asarray(mine), local, n_videos=10)
    np.testing.assert_allclose(got, full, rtol=1e-6)

    # --- one global-mesh train step with per-host batch chunks
    from relaxtpu.parallel.train_dp import DistributedMlpTrainStep

    mesh = global_data_mesh(n_model=1)
    assert mesh.shape["data"] == 8
    step = DistributedMlpTrainStep(mesh, input_dim=32, hidden=16, use_bn=False)
    params, opt_state = step.init(jax.random.PRNGKey(0))
    xb = rng.normal(size=(8, 32)).astype(np.float32)  # local chunk: global 16
    yb = rng.uniform(1, 5, size=(8,)).astype(np.float32)
    params, opt_state, loss = step.step(params, opt_state, xb, yb, jax.random.PRNGKey(1))
    loss = float(np.asarray(jax.device_get(loss)))
    assert np.isfinite(loss), loss
    print(f"proc {pid}: ok loss={loss:.4f}")


if __name__ == "__main__":
    main()
