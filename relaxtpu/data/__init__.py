"""Dataset assembly: splits, greyscale filtering, MOS scale maps, feature store."""

from relaxtpu.data.splits import split_other, split_lsvq, split_cross_dataset
from relaxtpu.data.mos import mos_1_5_to_1_100, pred_0_100_to_1_5, mos_1_100_to_1_5
from relaxtpu.data.greyscale import is_greyscale_image, video_is_greyscale
from relaxtpu.data.store import FeatureStore

__all__ = [
    "split_other",
    "split_lsvq",
    "split_cross_dataset",
    "mos_1_5_to_1_100",
    "pred_0_100_to_1_5",
    "mos_1_100_to_1_5",
    "is_greyscale_image",
    "video_is_greyscale",
    "FeatureStore",
]
