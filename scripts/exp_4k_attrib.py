"""Attribute the 4K (2160p) end-to-end vps to transfer vs device compute.

Bench r4 measured vps_4k = 0.0105 (95 s/video) against a 0.106 transfer
floor from the link probe — 10x below floor, which by the bench's own
heuristic ("far below floor AND below the device bound") means either the
link behaves differently at large transfer sizes or the 4K device program
is far off its 540p-derived scaling.  At 4K the pipeline takes the chunked
high-res path (``pipeline._video_feature_async_i420_chunked``), so this
script mirrors that path with explicit timing fences: (a) upload of the
packed I420 buffers with block_until_ready, (b) the frames program + the
pair-chunk dispatch loop + finalize + fetch on device-resident buffers,
each repeated to separate compile from steady state.  (The reference has
no 4K benchmark; its timing anchor is the per-video "Execution time"
print, main_fragment_layerstack.py:279.)

MEASURED (v5e via tunnel, r4): see docs/DESIGN.md "High-res attribution".

Usage: python scripts/exp_4k_attrib.py [h] [w] [frames]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

H = int(sys.argv[1]) if len(sys.argv) > 1 else 2160
W = int(sys.argv[2]) if len(sys.argv) > 2 else 3840
N = int(sys.argv[3]) if len(sys.argv) > 3 else 16


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_extractor, synthetic_video
    from relaxtpu.ops.colorspace import pack_i420
    from relaxtpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    video = synthetic_video(rng, N, H, W)
    print(f"synthesis: {time.perf_counter() - t0:.1f}s (host, outside any bench timer)", flush=True)

    frames, prev, nxt, fyuv, nyuv = video
    t0 = time.perf_counter()
    fpk = pack_i420(*fyuv)
    npk = pack_i420(*nyuv)
    print(f"host pack_i420: {time.perf_counter() - t0:.1f}s", flush=True)
    mb = (fpk.size + npk.size) / 1e6
    print(f"payload: {mb:.0f} MB packed I420 per video", flush=True)

    # (a) upload with an explicit block.  NOTE: through the axon relay,
    # block_until_ready may ack before the bytes cross the tunnel — compare
    # with (c) below, where a dependent fetch forces real arrival.
    for trial in range(2):
        t0 = time.perf_counter()
        a = jax.device_put(fpk)
        b = jax.device_put(npk)
        a.block_until_ready(); b.block_until_ready()
        dt = time.perf_counter() - t0
        print(f"upload trial {trial} (block_until_ready): {dt:.2f}s = {mb / dt:.0f} MB/s", flush=True)

    # (c) upload + dependent scalar fetch: the fetch cannot complete until
    # the buffer actually arrived on device, so this bounds true transfer.
    t0 = time.perf_counter()
    c = jax.device_put(fpk)
    s = jnp.sum(c[::4096].astype(jnp.int32))
    _ = int(s)
    dt = time.perf_counter() - t0
    print(f"upload+dependent-fetch: {dt:.2f}s = {fpk.size / 1e6 / dt:.0f} MB/s true-arrival bound", flush=True)

    fx = build_extractor(jnp.bfloat16)
    chunk = fx.max_pair_batch(H, W)
    print(f"max_pair_batch at {H}x{W}: {chunk} (chunked high-res path)", flush=True)

    # (b) the chunked path itself, twice: first run includes compiles, the
    # second is the steady state the bench's per-video time converges to.
    for trial in range(2):
        t0 = time.perf_counter()
        vec = fx.video_feature_async_i420(fpk, npk, H, W)
        np.asarray(vec)
        dt = time.perf_counter() - t0
        print(f"e2e chunked trial {trial}: {dt:.1f}s -> {1 / dt:.4f} vps", flush=True)

    # (d) device-resident: mirror the chunked path on pre-uploaded buffers
    # so the dispatch loop + compute is isolated from the upload.
    from relaxtpu.features.layout import FRAG_RESNET_DIM, FRAG_VIT_DIM

    n_frames, n_pairs = len(fpk), len(npk)
    np_padded = -(-n_pairs // chunk) * chunk
    f_padded = max(-(-n_frames // 8) * 8, np_padded)

    def pad_rows(x, n_to):
        if len(x) < n_to:
            x = np.concatenate([x, np.repeat(x[-1:], n_to - len(x), axis=0)])
        return x

    fdev = jnp.asarray(pad_rows(fpk, f_padded))
    ndev = jnp.asarray(pad_rows(npk, np_padded))
    _ = int(jnp.sum(fdev[::4096].astype(jnp.int32)))  # force arrival
    _ = int(jnp.sum(ndev[::4096].astype(jnp.int32)))
    nf_dev = jnp.asarray(n_frames, jnp.int32)
    npair_dev = jnp.asarray(n_pairs, jnp.int32)
    for trial in range(2):
        t0 = time.perf_counter()
        stack_sum, vit_sum = fx._frames_sums_fn(
            fx.resnet_vars, fx.vit_vars, fdev, nf_dev, H, W
        )
        acc_rn = jnp.zeros((FRAG_RESNET_DIM,), jnp.float32)
        acc_vit = jnp.zeros((FRAG_VIT_DIM,), jnp.float32)
        for s0 in range(0, np_padded, chunk):
            acc_rn, acc_vit = fx._pairs_chunk_fn(
                fx.resnet_vars, fx.vit_vars, fdev, ndev,
                jnp.asarray(s0, jnp.int32), npair_dev, acc_rn, acc_vit,
                H, W, chunk,
            )
        np.asarray(fx._finalize_fn(stack_sum, vit_sum, acc_rn, acc_vit, nf_dev, npair_dev))
        dt = time.perf_counter() - t0
        print(f"device-resident chunked trial {trial}: {dt:.1f}s -> device-bound {1 / dt:.4f} vps", flush=True)


if __name__ == "__main__":
    main()
