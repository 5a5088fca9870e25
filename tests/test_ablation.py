"""Ablation feature-mode tests (residual variants, ref main_residual*.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from relaxtpu.features.ablation import AblationExtractor
from relaxtpu.features.pipeline import FeatureExtractor
from relaxtpu.models import ResNet50, ViT
from relaxtpu.models.initutil import fast_init


@pytest.fixture(scope="module")
def ablation():
    rn = fast_init(ResNet50(), jnp.zeros((1, 224, 224, 3)))
    vt = fast_init(ViT(), jnp.zeros((1, 224, 224, 3)))
    return AblationExtractor(FeatureExtractor(rn, vt))


@pytest.mark.slow
@pytest.mark.parametrize(
    "mode,network,layer,dim",
    [
        ("frame_diff", "resnet50", "pool", 2051),
        ("frame_diff", "resnet50", "last_layer", 2048),
        ("frame_diff_frag", "resnet50", "pool", 2051),
        ("optical_flow", "vit", "pool", 2304),
        ("optical_flow_frag", "vit", "pool", 2304),
        ("frame_diff", "resnet50", "layer_stack", 13120),
    ],
)
def test_ablation_modes_shapes(ablation, rng, mode, network, layer, dim):
    pairs = rng.integers(0, 256, (3, 96, 128, 3), dtype=np.uint8)
    out = ablation.pair_features(mode, network, layer, pairs[:-1], pairs[1:])
    assert out.shape == (2, dim)
    assert np.isfinite(out).all()
