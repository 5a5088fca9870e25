"""End-to-end VQA throughput benchmark (driver-run on real TPU).

Metric: videos/sec for the full ReLaX-VQA per-video pipeline on synthetic
KoNViD-1k-shaped input (540x960, 16 sampled frames + 16 frame pairs per
video): residual -> fragment selection -> Farneback flow -> flow fragment ->
merge -> ResNet-50 (15 taps) + DINO ViT-B/16 over frames and fragments ->
35,203-dim feature -> MLP -> MOS.  Host->device transfer of uint8 frames is
included; video decode is not (the reference's ffmpeg decode is also outside
its timed "Execution time" print, main_fragment_layerstack.py:279).

vs_baseline: ratio to a reference-equivalent run measured on this host's CPU
— the same operations executed the way the reference executes them
(per-frame Python loop, batch=1, one full ResNet forward per tap => 15
forwards per layer-stack call; per-pair cv2-style serial flow), using our own
kernels.  Measured once on a short clip and cached in bench_baseline.json.
The reference publishes no throughput numbers (SURVEY.md §6), so this is the
honest stand-in for "the reference pipeline on available hardware".
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

N_FRAMES = 16
N_PAIRS = 16
H, W = 540, 960
N_VIDEOS = 8  # timed videos after warmup
BASELINE_CACHE = os.path.join(os.path.dirname(__file__), "bench_baseline.json")


def synthetic_video(rng, n_frames: int):
    """Temporally-correlated noise so flow/fragments do real work."""
    base = rng.integers(0, 256, (H, W, 3), dtype=np.uint8).astype(np.float32)
    frames = []
    x = base
    for _ in range(n_frames):
        x = np.clip(x + rng.normal(0, 12, x.shape).astype(np.float32), 0, 255)
        frames.append(x.astype(np.uint8))
    return np.stack(frames)


def build_extractor(dtype):
    import jax
    import jax.numpy as jnp

    from relaxtpu.features.pipeline import FeatureExtractor
    from relaxtpu.models import ResNet50, ViT

    from relaxtpu.models.initutil import fast_init

    rn_vars = fast_init(ResNet50(), jnp.zeros((1, 224, 224, 3)))
    vit_vars = fast_init(ViT(), jnp.zeros((1, 224, 224, 3)))
    return FeatureExtractor(rn_vars, vit_vars, dtype=dtype)


def measure_tpu(videos) -> float:
    import jax.numpy as jnp

    fx = build_extractor(jnp.bfloat16)
    frames0, prev0, nxt0 = videos[0]
    np.asarray(fx.video_feature_async(frames0, prev0, nxt0))  # warmup/compile
    # pipelined: enqueue the next video's program while the device crunches
    # the previous one; only the 35,203-vector is fetched per video.
    t0 = time.perf_counter()
    pending = []
    for frames, prev, nxt in videos[1:]:
        pending.append(fx.video_feature_async(frames, prev, nxt))
        while len(pending) > 2:
            np.asarray(pending.pop(0))
    for p in pending:
        np.asarray(p)
    dt = time.perf_counter() - t0
    return (len(videos) - 1) / dt


def measure_reference_equivalent(video) -> float:
    """Reference-style execution: batch=1, 15 ResNet forwards per frame for
    the 15 taps (ref visualise_resnet.py:24-36), serial per-pair flow."""
    import jax.numpy as jnp

    fx = build_extractor(jnp.float32)
    frames, prev, nxt = video
    n_sub = 2  # frames measured; scaled to full video below
    # warmup single shapes
    fx.frame_features(frames[:1])
    fx.pair_features(prev[:1], nxt[:1])
    t0 = time.perf_counter()
    for i in range(n_sub):
        for _tap in range(15):  # reference: one full forward per hooked tap
            fx.frame_features(frames[i : i + 1])
        fx.pair_features(prev[i : i + 1], nxt[i : i + 1])
        # fragments ResNet taps also re-run per tap in the reference
        for _tap in range(14):
            fx.frame_features(frames[i : i + 1])
    dt = time.perf_counter() - t0
    per_video = dt / n_sub * N_FRAMES
    return 1.0 / per_video


def main():
    from relaxtpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    videos = []
    for _ in range(N_VIDEOS + 1):
        fr = synthetic_video(rng, N_FRAMES)
        pairs = synthetic_video(rng, N_PAIRS + 1)
        videos.append((fr, pairs[:-1], pairs[1:]))

    vps = measure_tpu(videos)

    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            baseline_vps = json.load(f)["reference_equivalent_vps"]
    else:
        baseline_vps = measure_reference_equivalent(videos[0])
        with open(BASELINE_CACHE, "w") as f:
            json.dump(
                {
                    "reference_equivalent_vps": baseline_vps,
                    "note": "reference-style execution (batch=1, per-tap forwards) on this host",
                },
                f,
            )

    print(
        json.dumps(
            {
                "metric": "videos/sec end-to-end VQA per chip (540p, 16f+16p)",
                "value": round(vps, 4),
                "unit": "videos/sec",
                "vs_baseline": round(vps / baseline_vps, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
