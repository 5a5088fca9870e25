"""VGG-16 with conv taps — ablation-study backbone.

The reference's ablations tap the raw outputs of all 13 conv layers of
torchvision ``vgg16.features`` (indices [0,2,5,7,10,12,14,17,19,21,24,26,28],
ref ``main_layer_stack.py:96``, ``src/extractor/visualise_vgg.py``) and the
``fc2`` = ``classifier[3]`` activation for 'pool' features
(``visualise_vgg_layer.py:53-59``).  Hooks on Conv2d/Linear modules see the
raw module output (pre-ReLU), reproduced here.  One forward emits everything.
"""

from __future__ import annotations

from typing import Any, Mapping

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# conv channel plan per torchvision vgg16; 'M' = maxpool
_VGG16_PLAN = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M")

# torchvision features indices of the 13 convs, in order
VGG_CONV_INDICES = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
VGG_TAPS = tuple(f"conv{i}" for i in VGG_CONV_INDICES)
VGG_STACK_DIM = 64 + 64 + 128 + 128 + 256 * 3 + 512 * 6  # 4,224


class VGG16(nn.Module):
    """Input (B, 224, 224, 3) ImageNet-normalized NHWC.

    Returns dict: per-conv taps ('conv<idx>', channel means if
    reduce='mean'), plus 'fc2' (B, 4096) classifier[3] output.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, reduce: str | None = "mean"):
        taps: dict[str, jnp.ndarray] = {}
        conv_i = 0
        feat_idx = 0
        for item in _VGG16_PLAN:
            if item == "M":
                x = nn.max_pool(x, (2, 2), (2, 2))
                feat_idx += 1
                continue
            x = nn.Conv(item, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        name=f"features_{feat_idx}")(x)
            name = f"conv{feat_idx}"
            if reduce == "mean":
                taps[name] = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
            else:
                taps[name] = x
            x = nn.relu(x)
            conv_i += 1
            feat_idx += 2  # conv + relu

        # classifier: adaptive avgpool to 7x7 is identity at 224 input
        b = x.shape[0]
        # torch flattens NCHW: (C, H, W) row-major -> transpose before reshape
        x = x.transpose(0, 3, 1, 2).reshape(b, -1)
        x = nn.Dense(4096, dtype=self.dtype, name="classifier_0")(x)
        x = nn.relu(x)
        x = nn.Dense(4096, dtype=self.dtype, name="classifier_3")(x)
        taps["fc2"] = x.astype(jnp.float32)  # pre-ReLU, hook semantics
        return taps


def port_torch_vgg16(sd: Mapping[str, Any]) -> dict:
    """torchvision vgg16 state_dict -> Flax variables."""

    def arr(k):
        v = sd[k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    params: dict[str, Any] = {}
    for idx in VGG_CONV_INDICES:
        params[f"features_{idx}"] = {
            "kernel": arr(f"features.{idx}.weight").transpose(2, 3, 1, 0),
            "bias": arr(f"features.{idx}.bias"),
        }
    for idx in (0, 3):
        params[f"classifier_{idx}"] = {
            "kernel": arr(f"classifier.{idx}.weight").T,
            "bias": arr(f"classifier.{idx}.bias"),
        }
    return {"params": params}
