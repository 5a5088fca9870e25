"""Video decode, frame sampling, dataset registry."""

from relaxtpu.io.video import (
    frame_interval_for,
    sample_indices,
    residual_pair_indices,
    decode_sampled_frames,
    decode_frame_pairs,
)
from relaxtpu.io.datasets import DatasetSpec, DATASET_REGISTRY, get_dataset

__all__ = [
    "frame_interval_for",
    "sample_indices",
    "residual_pair_indices",
    "decode_sampled_frames",
    "decode_frame_pairs",
    "DatasetSpec",
    "DATASET_REGISTRY",
    "get_dataset",
]
