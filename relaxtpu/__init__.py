"""relaxtpu — TPU-native no-reference video quality assessment framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of ReLaX-VQA
(xinyiW915/ReLaX-VQA, arXiv 2407.11496): frame sampling, frame-difference
residuals, Farneback optical flow, motion-ranked fragment assembly, ResNet-50
and DINO ViT-B/16 feature taps, the 35,203-dim ReLaX-VQA feature vector, the
MLP quality regressor with MAE+pairwise-rank loss and SWA, the repeated
holdout / k-fold training protocol, cross-dataset fine-tuning, and single-video
MOS prediction — redesigned TPU-first:

- the whole per-frame-pair compute path (residual -> flow -> fragments ->
  backbones -> feature row) is one jitted, batched XLA program;
- backbones run ONE forward per image and emit all activation taps with the
  pooling statistics fused in (vs 15 hooked forwards at batch=1 in the
  reference, ``src/extractor/visualise_resnet.py:24-36``);
- dataset-scale evaluation shards frame-pair batches over a
  ``jax.sharding.Mesh`` (data parallel over ICI), with the MLP head optionally
  tensor-parallel over its 35,203-wide input layer.
"""

__version__ = "0.1.0"


def __getattr__(name):  # lazy top-level API (avoids importing jax at pkg import)
    if name == "FeatureExtractor":
        from relaxtpu.features.pipeline import FeatureExtractor

        return FeatureExtractor
    if name == "VideoQualityPredictor":
        from relaxtpu.predict import VideoQualityPredictor

        return VideoQualityPredictor
    if name == "RunConfig":
        from relaxtpu.config import RunConfig

        return RunConfig
    raise AttributeError(name)
