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
    # 'auto' (default): decoder-native I420 upload + device colorspace when
    # available (the fast path); 'bgr' = host conversion (strict parity)
    ingest: str = "auto"


@dataclasses.dataclass
class RuntimeConfig:
    # Mesh shape for extract/predict-batch: n_data*n_model > 1 shards work
    # over a ('data', 'model') device mesh (relaxtpu.parallel); None/1 = the
    # single-device streaming path.
    n_data: int | None = None
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
        unknown = set(raw) - {"extract", "train", "runtime"}
        if unknown:
            raise ValueError(
                f"unknown config sections: {sorted(unknown)} "
                "(expected extract/train/runtime)"
            )
        # unknown keys INSIDE a section raise TypeError from the dataclass
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
