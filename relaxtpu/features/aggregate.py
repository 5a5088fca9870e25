"""Per-frame pooling statistics over backbone taps.

Reimplements the reference aggregators
(``/root/reference/src/main_layer_stack.py:115-151``,
``main_fragment_layerstack.py:124-160``) as fused jnp ops over batched taps.
"""

from __future__ import annotations

import jax.numpy as jnp

from relaxtpu.models.resnet import RESNET_TAPS


def layer_stack_feature(taps: dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Concat channel means of the 15 taps in spec order -> (B, 13120).

    Channel means are already fused into the ResNet forward
    (``ResNet50(..., reduce='mean')``); this just concatenates in the frozen
    RESNET_TAPS order (ref ``process_video_feature`` iterates the activation
    dict in insertion order, ``main_layer_stack.py:134-140``).
    """
    return jnp.concatenate([taps[name] for name in RESNET_TAPS], axis=-1)


def resnet_pool_feature(avgpool: jnp.ndarray) -> jnp.ndarray:
    """(B, 2048) avgpool -> (B, 2051) = [vector | mean | max | std].

    The reference squeezes the (2048,1,1) avgpool tap then appends scalar
    mean/max/std of the vector (``main_fragment_layerstack.py:141-148``).
    np.std uses ddof=0.
    """
    mean = jnp.mean(avgpool, axis=-1, keepdims=True)
    mx = jnp.max(avgpool, axis=-1, keepdims=True)
    std = jnp.std(avgpool, axis=-1, keepdims=True)
    return jnp.concatenate([avgpool, mean, mx, std], axis=-1)
