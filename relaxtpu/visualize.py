"""Attention visualization — ``demo_visual.py`` parity.

Maps ViT head-mean CLS attention over fragment patches back onto the original
frame positions as a heatmap overlay (ref ``src/demo_visual.py:12-25,41-60``,
``visualise_vit_layer.py:353-370``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from relaxtpu.models.vit import ViT


def last_selfattention(vit: ViT, variables, img_rgb01: np.ndarray) -> np.ndarray:
    """(H, W, 3) [0,1] RGB -> (heads, N+1, N+1) last-block attention."""
    x = jnp.asarray(img_rgb01, jnp.float32)[None]
    attn = jax.jit(lambda v, xx: vit.apply(v, xx, reduce="last_attn"))(variables, x)
    return np.asarray(attn)[0]


def cls_patch_attention(attn: np.ndarray, grid: int = 14) -> np.ndarray:
    """CLS-row attention per patch, head mean -> (grid, grid).

    ref ``visualize_attention:353-370``: attentions[0, :, 0, 1:] reshaped to
    the patch grid; demo_visual then block-means back to patch resolution, so
    this is exactly the head-mean CLS->patch map.
    """
    cls_row = attn[:, 0, 1:]  # (heads, N)
    return cls_row.mean(axis=0).reshape(grid, grid)


def map_attention_to_original(
    original_frame_bgr: np.ndarray,
    patch_attention_flat: np.ndarray,
    positions: list[tuple[int, int]],
    patch_size: int = 16,
) -> np.ndarray:
    """Scatter per-fragment-slot attention back to source patch positions and
    overlay as a JET heatmap (ref ``map_attention_to_original:12-25``)."""
    import cv2

    full = np.zeros(original_frame_bgr.shape[:2], dtype=float)
    for (pos, att) in zip(positions, patch_attention_flat):
        y, x = pos
        full[y * patch_size : (y + 1) * patch_size, x * patch_size : (x + 1) * patch_size] = att
    full = (full / max(full.max(), 1e-12)) * 255
    heatmap = cv2.applyColorMap(full.astype(np.uint8), cv2.COLORMAP_JET)
    return cv2.addWeighted(original_frame_bgr, 0.6, heatmap, 0.4, 0)


def fragment_positions(residual_bgr: np.ndarray, patch_size: int = 16, top_n: int = 196):
    """Selected patch (row, col) positions for a residual image, matching the
    fragment pipeline's selection (ascending row-major)."""
    from relaxtpu.ops import patch_scores, top_patch_indices

    h, w = residual_bgr.shape[:2]
    wp = (w // patch_size)
    ids = np.asarray(top_patch_indices(patch_scores(jnp.asarray(residual_bgr)), top_n))
    return [(int(i) // wp, int(i) % wp) for i in ids]
