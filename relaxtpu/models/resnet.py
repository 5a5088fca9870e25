"""ResNet-50 with multi-layer activation taps, NHWC, Flax linen.

Architecture mirrors torchvision ``resnet50`` (v1, stride on the 3x3 conv)
so pretrained torchvision checkpoints port weight-for-weight
(``relaxtpu.models.porters.port_torch_resnet50``).

TPU-first design departures from the reference
(``/root/reference/src/extractor/visualise_resnet.py``):

- ONE forward pass returns all tap activations; the reference runs a full
  forward per hooked layer (15x redundant compute, ref ``get_activation:24-36``).
- Batched NHWC inputs; the reference is batch=1.
- The taps the ReLaX-VQA layer-stack feature needs are the raw ``conv1``
  output (pre-BN/ReLU — a hook on the conv module sees the conv output) and
  the post-ReLU output of each residual block conv1/layer1[0..2]/
  layer2[0..3]/layer3[0..3]/layer4[0..2] (ref ``main_layer_stack.py:88-92``;
  note layer3 taps cover only its first 4 of 6 blocks), plus the global
  average pool ("resnet50.avgpool", ref ``main_fragment_pool.py:91``).

The model optionally returns channel means directly (``reduce='mean'``) so
only (B, C) tensors leave the XLA program — the layer-stack statistic the
feature assembler needs — instead of full activation maps.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

# Tap names in feature-layout order (frozen spec; 64 + 3*256 + 4*512 +
# 4*1024 + 3*2048 = 13,120 channel means).
RESNET_TAPS = (
    "conv1",
    "layer1.0",
    "layer1.1",
    "layer1.2",
    "layer2.0",
    "layer2.1",
    "layer2.2",
    "layer2.3",
    "layer3.0",
    "layer3.1",
    "layer3.2",
    "layer3.3",
    "layer4.0",
    "layer4.1",
    "layer4.2",
)

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)

_STAGES = ((3, 64, 1), (4, 128, 2), (6, 256, 2), (3, 512, 2))


def resnet_preprocess(img_rgb_f01: jnp.ndarray) -> jnp.ndarray:
    """ImageNet normalization of (..., H, W, 3) RGB in [0, 1]
    (torchvision transform, ref ``visualise_resnet.py:40-44``)."""
    mean = jnp.asarray(_IMAGENET_MEAN, img_rgb_f01.dtype)
    std = jnp.asarray(_IMAGENET_STD, img_rgb_f01.dtype)
    return (img_rgb_f01 - mean) / std


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4), post-add ReLU."""

    width: int
    stride: int
    project: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=True, epsilon=1e-5, dtype=self.dtype, name=name
        )
        conv = lambda feat, k, s, name: nn.Conv(  # noqa: E731
            feat, (k, k), (s, s), padding=[(k // 2, k // 2)] * 2,
            use_bias=False, dtype=self.dtype, name=name,
        )
        residual = x
        y = nn.relu(bn("bn1")(conv(self.width, 1, 1, "conv1")(x)))
        y = nn.relu(bn("bn2")(conv(self.width, 3, self.stride, "conv2")(y)))
        y = bn("bn3")(conv(self.width * 4, 1, 1, "conv3")(y))
        if self.project:
            residual = bn("downsample_bn")(
                conv(self.width * 4, 1, self.stride, "downsample_conv")(x)
            )
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """Multi-tap ResNet-50. Input: (B, 224, 224, 3) preprocessed NHWC.

    Returns a dict of taps. With ``reduce='mean'`` each tap is its channel
    mean (B, C) and ``avgpool`` the (B, 2048) global pool; with
    ``reduce=None`` full activation maps are returned (parity tests).
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, reduce: str | None = "mean"):
        taps: dict[str, jnp.ndarray] = {}

        def emit(name, act):
            if reduce == "mean":
                taps[name] = jnp.mean(act.astype(jnp.float32), axis=(1, 2))
            else:
                taps[name] = act

        y = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        emit("conv1", y)  # raw conv output: a hook on nn.Conv2d sees pre-BN
        y = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])

        for si, (blocks, width, stride) in enumerate(_STAGES, start=1):
            for bi in range(blocks):
                y = Bottleneck(
                    width=width,
                    stride=stride if bi == 0 else 1,
                    project=(bi == 0),
                    dtype=self.dtype,
                    name=f"layer{si}_{bi}",
                )(y)
                name = f"layer{si}.{bi}"
                if name in RESNET_TAPS:
                    emit(name, y)

        # adaptive average pool to 1x1 == global mean (B, 2048)
        taps["avgpool"] = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
        return taps
