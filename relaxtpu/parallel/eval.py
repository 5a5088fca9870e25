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
from relaxtpu.parallel.mesh import replicate

log = logging.getLogger("relaxtpu.parallel.eval")


class ShardedVideoEvaluator:
    """Evaluates videos -> 35,203-dim vectors, sharded over a mesh.

    Two sharding regimes, both over the mesh's ``data`` axis:

    - :meth:`videos_batch_feature_i420` / the ``run`` grouping path shard the
      VIDEO axis of the batched multi-video program (videos are
      embarrassingly parallel — the natural pjit layout; zero collectives
      during extraction).
    - :meth:`video_feature` shards the FRAME/PAIR axis of one video's
      programs (useful when a single huge video must spread over the mesh).
    """

    def __init__(
        self,
        extractor: FeatureExtractor,
        mesh: Mesh,
        decode_workers: int = 4,
        videos_per_device: int = 1,
    ):
        self.fx = extractor
        self.mesh = mesh
        self.decode_workers = decode_workers
        self.videos_per_device = videos_per_device
        self._sharding = NamedSharding(mesh, P("data"))
        self._replicated = replicate(mesh)
        self._vars_replicated = None

    def _mesh_vars(self):
        """Backbone weights replicated across the mesh (once)."""
        if self._vars_replicated is None:
            self._vars_replicated = (
                jax.device_put(self.fx.resnet_vars, self._replicated),
                jax.device_put(self.fx.vit_vars, self._replicated),
            )
        return self._vars_replicated

    def videos_batch_feature_i420(
        self, frames_i420_list, next_i420_list, h: int, w: int, bucket: int = 8
    ):
        """(V, 35203) device array (async): the batched multi-video program
        with the video axis sharded over the mesh's data axis.  The video
        count is padded to a multiple of the data-axis size (duplicates of
        the last video; rows sliced off by the caller via ``len(...)``)."""
        n = self.mesh.shape["data"]
        v_real = len(frames_i420_list)
        pad = (-v_real) % n
        frames_i420_list = list(frames_i420_list) + [frames_i420_list[-1]] * pad
        next_i420_list = list(next_i420_list) + [next_i420_list[-1]] * pad
        fstack, nstack, nf, npair = self.fx.stack_videos_i420(
            frames_i420_list, next_i420_list, bucket
        )
        rn, vit = self._mesh_vars()
        # flow working-set cap is PER DEVICE; the chunked scan counts global
        # pairs, so scale by the data-axis width
        chunk = self.fx.max_pair_batch(h, w) * n
        out = self.fx.videos_fn()(
            rn,
            vit,
            jax.device_put(fstack, self._sharding),
            jax.device_put(nstack, self._sharding),
            jax.device_put(nf, self._sharding),
            jax.device_put(npair, self._sharding),
            h,
            w,
            chunk,
        )
        return out[:v_real]

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

        On a 1-device mesh this is the async streaming path (dispatch-ahead
        queue).  On a multi-device mesh, same-resolution i420 videos are
        grouped into ``data_axis * videos_per_device``-sized batches of the
        video-axis-sharded program; BGR decodes fall back to the
        frame-axis-sharded per-video path.
        """
        n_data = self.mesh.shape["data"]
        out_map: dict[int, np.ndarray] = {}
        emitted = 0

        def emit(i: int, vec: np.ndarray):
            # on_result fires in INPUT order on every branch: the multi-device
            # path finishes BGR singles while i420 batches are still grouped,
            # so completions are buffered until their predecessors land.
            nonlocal emitted
            out_map[i] = vec
            while on_result and emitted in out_map:
                on_result(emitted, out_map[emitted])
                emitted += 1

        with cf.ThreadPoolExecutor(max_workers=self.decode_workers) as pool:
            futures = [pool.submit(decode_fn, v) for v in videos]
            if n_data == 1:
                pending: list = []  # (index, device array) — dispatch-ahead queue

                def drain(limit: int):
                    while len(pending) > limit:
                        j, dev = pending.pop(0)
                        emit(j, np.asarray(dev))

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
                    drain(2)  # <=3 videos in flight: decode || transfer || compute
                    log.debug(
                        "video %d dispatched (%d frames, %d pairs)", i, n_frames, n_pairs
                    )
                drain(0)
            else:
                group_size = n_data * self.videos_per_device
                groups: dict[tuple[int, int], list] = {}  # (h, w) -> [(i, f, n)]
                in_flight: list = []  # (indices, device batch)

                def flush(key):
                    items = groups.pop(key, [])
                    if not items:
                        return
                    h, w = key
                    dev = self.videos_batch_feature_i420(
                        [it[1] for it in items], [it[2] for it in items], h, w
                    )
                    in_flight.append(([it[0] for it in items], dev))

                def drain(limit: int):
                    while len(in_flight) > limit:
                        idxs, dev = in_flight.pop(0)
                        for j, vec in zip(idxs, np.asarray(dev)):
                            emit(j, vec)

                for i, fut in enumerate(futures):
                    res = fut.result()
                    if isinstance(res[0], str) and res[0] == "i420":
                        _, fbuf, nbuf, h, w = res
                        groups.setdefault((h, w), []).append((i, fbuf, nbuf))
                        if len(groups[(h, w)]) >= group_size:
                            flush((h, w))
                            drain(1)  # one batch computing, one queued
                    else:
                        frames, prev, nxt = res
                        emit(i, self.video_feature(frames, prev, nxt))
                for key in list(groups):
                    flush(key)
                drain(0)
        return [out_map[i] for i in range(len(futures))]
