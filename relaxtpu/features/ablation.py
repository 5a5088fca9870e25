"""Ablation feature pipelines.

The reference ships five residual feature variants driven by separate
scripts (``main_residual.py``, ``main_residual_fragment.py``,
``main_layer.py``, ``main_layer_stack.py``, ``main_fragment_pool.py``);
here they are modes of one extractor:

- ``frame_diff``        whole residual image -> single-layer features
                        (ref main_residual.py:226-268)
- ``optical_flow``      whole flow image -> single-layer features
- ``frame_diff_frag``   residual fragment only (no original fragment,
                        no merge; ref main_residual_fragment.py:273-317)
- ``optical_flow_frag`` flow fragment only
- ``merged_frag``       the full model (FeatureExtractor.pair_features)
- ``layer_stack``/``pool`` full-frame features (main_layer_stack/main_layer)

Single-layer taps: 'pool' = resnet avgpool (2051-d after stats) or ViT token
stats (2304-d); 'last_layer' = resnet layer4[2] channel mean (2048-d).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from relaxtpu.features.aggregate import resnet_pool_feature
from relaxtpu.features.pipeline import FARNEBACK_PARAMS, FeatureExtractor, _bgr_u8_to_rgb01
from relaxtpu.models.resnet import resnet_preprocess
from relaxtpu.ops import (
    absdiff,
    bgr_to_gray,
    farneback_flow,
    flow_to_bgr,
    gather_fragment,
    patch_scores,
    top_patch_indices,
)

RESIDUAL_MODES = ("frame_diff", "optical_flow", "frame_diff_frag", "optical_flow_frag", "merged_frag")


class AblationExtractor:
    """Residual-variant features over frame pairs, batched + jitted."""

    def __init__(self, base: FeatureExtractor):
        self.base = base
        self._fns: dict = {}

    def _residual_image(self, mode: str, prev, nxt):
        if mode.startswith("frame_diff"):
            return absdiff(nxt, prev)
        flow = farneback_flow(bgr_to_gray(prev), bgr_to_gray(nxt), **FARNEBACK_PARAMS)
        return flow_to_bgr(flow)

    def _pair_images(self, mode: str, prev, nxt):
        img = self._residual_image(mode, prev, nxt)
        if mode.endswith("_frag"):
            ids = top_patch_indices(patch_scores(img))
            img = gather_fragment(img, ids)
        return img

    def _features(self, mode: str, network: str, layer: str, resnet_vars, vit_vars, prev, nxt):
        imgs = jax.vmap(lambda p, n: self._pair_images(mode, p, n))(prev, nxt)
        return self._features_from_images(network, layer, resnet_vars, vit_vars, imgs)

    def _features_from_images(self, network: str, layer: str, resnet_vars, vit_vars, imgs):
        """(B,H,W,3) uint8 BGR images -> (B, D) single-network features.
        Shared by residual-variant pairs and full-frame single-tap extraction
        (ref main_layer.py:81-113)."""
        rgb = _bgr_u8_to_rgb01(imgs, jnp.float32)
        if rgb.shape[1:3] != (224, 224):
            b = rgb.shape[0]
            method = "linear" if network == "resnet50" else "lanczos3"
            rgb = jax.image.resize(rgb, (b, 224, 224, 3), method, antialias=True)
        if network == "resnet50":
            x = resnet_preprocess(rgb).astype(self.base.dtype)
            taps = self.base.resnet.apply(resnet_vars, x, reduce="mean")
            if layer == "pool":
                return resnet_pool_feature(taps["avgpool"])
            if layer == "last_layer":
                return taps["layer4.2"]
            from relaxtpu.features.aggregate import layer_stack_feature

            return layer_stack_feature(taps)
        x = rgb.astype(self.base.dtype)
        return self.base.vit.apply(vit_vars, x, reduce="stats")

    def pair_features(self, mode: str, network: str, layer: str, prev, nxt) -> np.ndarray:
        """(B,H,W,3) uint8 BGR pairs -> (B, D) ablation features."""
        assert mode in RESIDUAL_MODES and mode != "merged_frag", mode
        key = (mode, network, layer)
        if key not in self._fns:
            self._fns[key] = jax.jit(
                lambda rv, vv, p, n: self._features(mode, network, layer, rv, vv, p, n)
            )
        out = self._fns[key](
            self.base.resnet_vars, self.base.vit_vars, jnp.asarray(prev), jnp.asarray(nxt)
        )
        return np.asarray(out)
