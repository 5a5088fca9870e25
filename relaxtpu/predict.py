"""Single-video MOS prediction — the ``demo_test.py`` parity entry point.

``evaluate_video_quality`` equivalent (ref ``src/demo_test.py:51-219``):
decode + sample -> full-frame features -> fragment features -> 35,203 vector
-> imputer/scaler -> MLP -> MOS (rescaled to 1-5 for konvid/youtube when not
fine-tuned).  All compute after decode is two jitted XLA programs.
"""

from __future__ import annotations

import dataclasses
import logging

import jax
import jax.numpy as jnp
import numpy as np

from relaxtpu.features.pipeline import FeatureExtractor
from relaxtpu.io.video import decode_frame_pairs, decode_sampled_frames  # noqa: F401 (public API)
from relaxtpu.model.mlp import Mlp
from relaxtpu.model.scalers import FeatureScaler
from relaxtpu.data.mos import pred_0_100_to_1_5

log = logging.getLogger("relaxtpu.predict")


@dataclasses.dataclass
class VideoQualityPredictor:
    extractor: FeatureExtractor
    mlp_variables: dict
    scaler: FeatureScaler
    video_type: str = "konvid_1k"
    is_finetune: bool = False
    use_bn: bool = True

    def __post_init__(self):
        self._mlp = Mlp(use_bn=self.use_bn)
        self._head = jax.jit(
            lambda v, x: self._mlp.apply(v, x, train=False).reshape(-1)
        )

    def predict_feature(self, feature_35203: np.ndarray) -> float:
        x = self.scaler.transform(feature_35203.reshape(1, -1)).astype(np.float32)
        pred = float(self._head(self.mlp_variables, jnp.asarray(x))[0])
        if self.is_finetune:
            return pred
        if self.video_type in ("youtube_ugc", "konvid_1k"):
            return float(pred_0_100_to_1_5(pred))  # ref demo_test.py:214-217
        return pred

    def predict_arrays(self, frames, prev, nxt) -> float:
        vec = self.extractor.video_feature(frames, prev, nxt)
        return self.predict_feature(vec)

    def enqueue_file(self, path: str, framerate: float | None = None,
                     width: int | None = None, height: int | None = None,
                     ingest: str = "bgr"):
        """Decode ``path`` and enqueue its whole-video feature program
        WITHOUT blocking; returns the pending (35203,) device array (fetch
        with np.asarray, score with :meth:`predict_feature`).  Lets serving
        loops pipeline decode/transfer of request N+1 against device compute
        of request N.

        ``ingest``: 'yuv' uploads decoder-native I420 planes (half the
        host->device bytes; device conversion bit-matches the host converter
        — frames differ from the sws BGR decode by <=2 LSB where sws rounds
        differently), 'bgr' converts on host (reference-decode parity),
        'auto' prefers yuv when the native decoder + even dimensions allow
        it."""
        if ingest in ("auto", "yuv") and not path.endswith(".yuv"):
            try:
                from relaxtpu.io.video import decode_video_inputs_i420

                fbuf, nbuf, h, w = decode_video_inputs_i420(path, framerate, width, height)
                log.info(
                    "decoded %d frames, %d pairs from %s (yuv ingest)",
                    len(fbuf), len(nbuf), path,
                )
                return self.extractor.video_feature_async_i420(fbuf, nbuf, h, w)
            except Exception as e:
                if ingest == "yuv":
                    raise
                log.info("yuv ingest unavailable (%s); falling back to bgr", e)
        from relaxtpu.io.video import decode_video_inputs

        frames, prev, nxt = decode_video_inputs(path, framerate, width, height)
        log.info("decoded %d frames, %d pairs from %s", len(frames), len(prev), path)
        return self.extractor.video_feature_async(frames, prev, nxt)

    def predict_file(self, path: str, framerate: float | None = None,
                     width: int | None = None, height: int | None = None,
                     ingest: str = "bgr") -> float:
        """Blocking single-video path -> MOS (see :meth:`enqueue_file` for
        the ingest contract)."""
        try:
            vec = np.asarray(self.enqueue_file(path, framerate, width, height, ingest))
        except Exception as e:
            # Device-side yuv-program failures surface only at fetch (the
            # enqueue is async); 'auto' promises a bgr retry for those too.
            if ingest != "auto":
                raise
            log.warning("auto-ingest fetch failed (%s); retrying via bgr", e)
            vec = np.asarray(self.enqueue_file(path, framerate, width, height, "bgr"))
        return self.predict_feature(vec)
