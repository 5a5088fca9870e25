"""Backbone models: ResNet-50 (multi-tap) and DINO ViT-B/16, in Flax.

Both run ONE forward per image batch and emit every activation tap the
ReLaX-VQA feature stack needs, replacing the reference's 15 hooked forwards
at batch=1 per frame (``/root/reference/src/extractor/visualise_resnet.py:24-36``)
and its per-frame ViT reconstruction (``src/main_layer_stack.py:104-110``).
"""

from relaxtpu.models.resnet import ResNet50, RESNET_TAPS, resnet_preprocess
from relaxtpu.models.vit import ViT, vit_preprocess
from relaxtpu.models.porters import (
    port_torch_resnet50,
    port_torch_vit,
    load_torch_checkpoint,
)

__all__ = [
    "ResNet50",
    "RESNET_TAPS",
    "resnet_preprocess",
    "ViT",
    "vit_preprocess",
    "port_torch_resnet50",
    "port_torch_vit",
    "load_torch_checkpoint",
]
