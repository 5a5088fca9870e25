"""Top-level run configuration.

Replaces the reference's hand-edited module constants + scattered argparse
(``main_fragment_layerstack.py:251-257``, ``model_regression.py:719-752``)
with one serializable config: dataset spec, extraction options, training
protocol, and runtime/parallelism knobs.  Load/save as JSON.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any

from relaxtpu.model.train import TrainConfig


@dataclasses.dataclass
class ExtractConfig:
    dataset: str = "konvid_1k"
    data_root: str = "."
    metadata_dir: str = "metadata"
    output_dir: str = "features_out"
    backbone_dtype: str = "bfloat16"  # 'float32' for strict-parity mode
    resnet_weights: str | None = None
    vit_weights: str | None = None
    frame_bucket: int = 8  # shape-bucketing granularity for padded batches
    ingest: str = "bgr"  # 'yuv' = decoder-native I420 upload + device colorspace


@dataclasses.dataclass
class RuntimeConfig:
    n_data: int | None = None  # mesh data-axis size (None = all devices)
    n_model: int = 1
    decode_workers: int = 4
    dispatch_ahead: int = 2
    compilation_cache: str | None = None  # None -> repo-local .jax_cache
    profile_dir: str | None = None


@dataclasses.dataclass
class RunConfig:
    extract: ExtractConfig = dataclasses.field(default_factory=ExtractConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    runtime: RuntimeConfig = dataclasses.field(default_factory=RuntimeConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "RunConfig":
        raw: dict[str, Any] = json.loads(text)
        return cls(
            extract=ExtractConfig(**raw.get("extract", {})),
            train=TrainConfig(**raw.get("train", {})),
            runtime=RuntimeConfig(**raw.get("runtime", {})),
        )

    @classmethod
    def load(cls, path: str) -> "RunConfig":
        with open(path) as f:
            return cls.from_json(f.read())

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())
