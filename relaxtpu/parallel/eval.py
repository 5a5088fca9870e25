"""Dataset-scale sharded feature extraction + evaluation.

Replaces the reference's serial per-video Python loop
(``main_fragment_layerstack.py:269``) with a mesh-sharded driver: frame/pair
batches from each video are padded to the data-axis size and sharded across
devices; XLA runs the fused feature program data-parallel, and per-video
reductions happen on the (tiny) feature rows.  Decode runs on host threads,
overlapping the accelerator work (double-buffered producer/consumer).
"""

from __future__ import annotations

import concurrent.futures as cf
import logging
from typing import Callable, Iterable

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from relaxtpu.features.pipeline import FeatureExtractor

log = logging.getLogger("relaxtpu.parallel.eval")


class ShardedVideoEvaluator:
    """Evaluates videos -> 35,203-dim vectors, sharded over a mesh."""

    def __init__(self, extractor: FeatureExtractor, mesh: Mesh, decode_workers: int = 4):
        self.fx = extractor
        self.mesh = mesh
        self.decode_workers = decode_workers
        self._sharding = NamedSharding(mesh, P("data"))

    def _pad_shard(self, arr: np.ndarray) -> tuple[jax.Array, int]:
        n = self.mesh.shape["data"]
        real = len(arr)
        pad = (-real) % n
        if pad:
            arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)], axis=0)
        return jax.device_put(arr, self._sharding), real

    def video_feature(self, frames: np.ndarray, prev: np.ndarray, nxt: np.ndarray) -> np.ndarray:
        f_dev, f_real = self._pad_shard(frames)
        stack, vit_stats = self.fx._frame_fn(f_dev)
        stack = np.asarray(stack)[:f_real]
        vit_stats = np.asarray(vit_stats)[:f_real]
        # Pair batches are chunked to the per-device HBM budget of the flow
        # warp (pipeline.max_pair_batch), scaled by the data-axis width —
        # 1080p/4K videos would otherwise OOM through this path while the
        # single-chip path survives.
        prev = np.asarray(prev)
        nxt = np.asarray(nxt)
        bmax = self.fx.max_pair_batch(prev.shape[1], prev.shape[2]) * self.mesh.shape["data"]
        frs, fvs = [], []
        for i in range(0, len(prev), bmax):
            p_dev, p_real = self._pad_shard(prev[i : i + bmax])
            n_dev, _ = self._pad_shard(nxt[i : i + bmax])
            frag_rn, frag_vit = self.fx._pair_fn(p_dev, n_dev)
            frs.append(np.asarray(frag_rn)[:p_real])
            fvs.append(np.asarray(frag_vit)[:p_real])
        frag_rn = np.concatenate(frs)
        frag_vit = np.concatenate(fvs)
        return np.concatenate(
            [stack.mean(0), vit_stats.mean(0), frag_rn.mean(0), frag_vit.mean(0)]
        )

    def run_distributed(
        self,
        videos: list,
        decode_fn: Callable[[object], tuple[np.ndarray, np.ndarray, np.ndarray]],
    ) -> np.ndarray:
        """Multi-host dataset eval: videos shard over processes (DCN — zero
        cross-host traffic during extraction), each host runs its subset on
        its local mesh, and the tiny (n_videos, 35203) matrix is allgathered
        once at the end.  Single-process runs degrade to ``run``."""
        from relaxtpu.parallel.distributed import allgather_video_features, shard_videos

        import jax

        pid, n = jax.process_index(), jax.process_count()
        mine = shard_videos(list(enumerate(videos)), pid, n)
        local = self.run([v for _, v in mine], decode_fn)
        idx = np.asarray([i for i, _ in mine], int)
        vecs = np.stack(local) if local else np.zeros((0, 35203), np.float32)
        return allgather_video_features(idx, vecs, n_videos=len(videos))

    def run(
        self,
        videos: Iterable,
        decode_fn: Callable[[object], tuple[np.ndarray, np.ndarray, np.ndarray]],
        on_result: Callable[[int, np.ndarray], None] | None = None,
    ) -> list[np.ndarray]:
        """Pipeline: host decode threads feed the device; results in order.

        ``decode_fn(video) -> (frames, prev, nxt)`` BGR arrays, or the
        YUV-ingest form ``("i420", frames_i420, next_i420, h, w)``
        (``relaxtpu.io.video.decode_video_inputs_i420``) — half the
        host->device bytes, single-buffer uploads.
        """
        out: list[np.ndarray] = []
        with cf.ThreadPoolExecutor(max_workers=self.decode_workers) as pool:
            futures = [pool.submit(decode_fn, v) for v in videos]
            pending: list = []  # (index, device array) — dispatch-ahead queue

            def drain(limit: int):
                while len(pending) > limit:
                    i, dev = pending.pop(0)
                    vec = np.asarray(dev)
                    out.append(vec)
                    if on_result:
                        on_result(i, vec)

            for i, fut in enumerate(futures):
                res = fut.result()
                if isinstance(res[0], str) and res[0] == "i420":
                    _, fbuf, nbuf, h, w = res
                    dev = self.fx.video_feature_async_i420(fbuf, nbuf, h, w)
                    n_frames, n_pairs = len(fbuf), len(nbuf)
                else:
                    frames, prev, nxt = res
                    dev = self.fx.video_feature_async(frames, prev, nxt)
                    n_frames, n_pairs = len(frames), len(prev)
                pending.append((i, dev))
                drain(2)  # keep <=3 videos in flight: decode || transfer || compute
                log.debug("video %d dispatched (%d frames, %d pairs)", i, n_frames, n_pairs)
            drain(0)
        return out
