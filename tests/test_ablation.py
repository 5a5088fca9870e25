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


# --------------------------------------------------------------------------
# Golden-value tests: the ablation DRIVER semantics (residual/flow routing,
# fragmentation, aggregation choice) against a step-by-step oracle built from
# numpy + independently-validated single ops (ref main_residual.py:226-268,
# main_residual_fragment.py:273-317).


def _smooth_pair(rng, h=224, w=272, shift=3):
    # >= 196 16x16 patches so fragment selection exercises real top-k
    """A translating textured pair (realistic flow, unlike iid noise)."""
    import scipy.ndimage as ndi

    base = ndi.gaussian_filter(
        rng.integers(0, 256, (h + 16, w + 16, 3)).astype(np.float64), (3, 3, 0)
    )
    prev = base[:h, :w]
    nxt = base[shift : h + shift, shift : w + shift]
    return prev.astype(np.uint8), nxt.astype(np.uint8)


def _oracle_ablation_image(mode, prev, nxt):
    """Residual-variant image for ONE pair via numpy + single validated ops."""
    from relaxtpu.features.pipeline import FARNEBACK_PARAMS
    from relaxtpu.ops import bgr_to_gray, farneback_flow, flow_to_bgr
    from tests.test_fragments import oracle_extract, oracle_patch_diff

    if mode.startswith("frame_diff"):
        img = np.abs(prev.astype(np.int32) - nxt.astype(np.int32)).astype(np.uint8)
    else:
        flow = np.asarray(
            farneback_flow(
                bgr_to_gray(jnp.asarray(prev)), bgr_to_gray(jnp.asarray(nxt)),
                **FARNEBACK_PARAMS,
            )
        )
        img = np.asarray(flow_to_bgr(jnp.asarray(flow)))
    if mode.endswith("_frag"):
        diff = oracle_patch_diff(img, 16)
        img, _ = oracle_extract(img, diff)
    return img


def _oracle_features(base, network, layer, img_bgr_u8):
    """Backbone features of ONE image, composed step by step (no batching,
    no mode routing — independent of AblationExtractor's jitted driver)."""
    from relaxtpu.features.aggregate import layer_stack_feature, resnet_pool_feature
    from relaxtpu.models.resnet import resnet_preprocess

    rgb = jnp.asarray(img_bgr_u8[None, :, :, ::-1].astype(np.float32) / 255.0)
    if rgb.shape[1:3] != (224, 224):
        method = "linear" if network == "resnet50" else "lanczos3"
        rgb = jax.image.resize(rgb, (1, 224, 224, 3), method, antialias=True)
    if network == "resnet50":
        taps = base.resnet.apply(base.resnet_vars, resnet_preprocess(rgb), reduce="mean")
        if layer == "pool":
            return np.asarray(resnet_pool_feature(taps["avgpool"]))[0]
        if layer == "last_layer":
            return np.asarray(taps["layer4.2"])[0]
        return np.asarray(layer_stack_feature(taps))[0]
    return np.asarray(base.vit.apply(base.vit_vars, rgb, reduce="stats"))[0]


@pytest.mark.slow
@pytest.mark.parametrize(
    "mode,network,layer",
    [
        ("frame_diff", "resnet50", "pool"),
        ("frame_diff_frag", "resnet50", "last_layer"),
        ("optical_flow", "resnet50", "pool"),
        ("optical_flow_frag", "vit", "pool"),
    ],
)
def test_ablation_values_match_oracle(ablation, rng, mode, network, layer):
    prev, nxt = _smooth_pair(rng)
    got = ablation.pair_features(mode, network, layer, prev[None], nxt[None])[0]
    img = _oracle_ablation_image(mode, prev, nxt)
    want = _oracle_features(ablation.base, network, layer, img)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_full_frame_single_layer_matches_oracle(ablation, rng):
    """CLI 'layer' mode (ref main_layer.py): full frames, one tap."""
    from relaxtpu.cli.__main__ import _single_layer_frames

    frames = rng.integers(0, 256, (2, 96, 128, 3), dtype=np.uint8)
    got = _single_layer_frames(ablation.base, ablation, "resnet50", "pool", frames)
    want = np.stack(
        [_oracle_features(ablation.base, "resnet50", "pool", f) for f in frames]
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
