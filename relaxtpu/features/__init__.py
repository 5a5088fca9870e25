"""Feature assembly: layer-stack / pool statistics and the 35,203-dim vector."""

from relaxtpu.features.layout import FEATURE_LAYOUT, TOTAL_FEATURE_DIM
from relaxtpu.features.aggregate import (
    layer_stack_feature,
    resnet_pool_feature,
)
from relaxtpu.features.pipeline import FeatureExtractor

__all__ = [
    "FEATURE_LAYOUT",
    "TOTAL_FEATURE_DIM",
    "layer_stack_feature",
    "resnet_pool_feature",
    "FeatureExtractor",
]
