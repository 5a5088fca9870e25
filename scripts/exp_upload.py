"""Host->device upload throughput vs buffer size through the axon relay.

exp_4k_attrib.py showed 398 MB monolithic buffers reach the device at
~4-20 MB/s effective while the 25 MB 540p video buffers sustain ~42 MB/s
(and block_until_ready acks at >1 GB/s without the bytes having arrived —
it measures the local memcpy into the relay, not the wire).  This script
maps effective arrival rate vs piece size by uploading the same total
bytes in k-frame pieces and forcing arrival with a dependent scalar fetch
per piece (one compile per piece shape, reused across pieces).

Usage: python scripts/exp_upload.py [total_frames] [h] [w]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16
H = int(sys.argv[2]) if len(sys.argv) > 2 else 2160
W = int(sys.argv[3]) if len(sys.argv) > 3 else 3840


def main():
    import jax
    import jax.numpy as jnp

    from relaxtpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    bpf = H * W * 3 // 2
    rng = np.random.default_rng(0)
    buf = rng.integers(0, 256, (N, bpf), dtype=np.uint8)
    total_mb = buf.size / 1e6
    print(f"total payload {total_mb:.0f} MB ({N} frames x {bpf / 1e6:.1f} MB)", flush=True)

    force = jax.jit(lambda x: jnp.sum(x[:, ::8191].astype(jnp.int32)))

    for k in (1, 2, 4, 8, 16):
        if N % k:
            continue
        # fresh bytes each run so no relay/content cache can short-circuit
        buf = rng.integers(0, 256, (N, bpf), dtype=np.uint8)
        pieces = [np.ascontiguousarray(buf[i : i + k]) for i in range(0, N, k)]
        # warm the force program for this piece shape (compile outside timer)
        warm = jax.device_put(pieces[0])
        int(force(warm))
        t0 = time.perf_counter()
        handles = [jax.device_put(p) for p in pieces]
        for hd in handles:
            int(force(hd))
        dt = time.perf_counter() - t0
        print(
            f"pieces of {k:2d} frames ({k * bpf / 1e6:6.1f} MB): "
            f"{total_mb / dt:6.1f} MB/s effective ({dt:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
