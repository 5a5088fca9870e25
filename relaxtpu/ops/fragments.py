"""Motion-ranked fragment construction.

Reference semantics (reimplemented, not ported — see
``/root/reference/src/main_fragment_layerstack.py:177-245``):

1. ``get_patch_diff`` (ref :177-189): crop the residual image to a multiple of
   ``patch_size`` and score each ``patch_size x patch_size`` patch by the sum
   of absolute values (uint8 residuals are non-negative, so plain sums).
2. ``extract_important_patches`` (ref :191-210): take the ``top_n`` patches by
   score (descending), then re-sort the selected patches by their original
   (row, col) position, and pack them raster-scan into a
   ``target_size x target_size`` canvas.  The (row, col) re-sort makes the
   output depend only on the selected *set*, so the whole selection reduces to
   "top_n patch ids, returned in ascending row-major order".
3. ``get_original_frame_patches`` (ref :212-230): gather the co-located
   patches of the *original* frame with the same positions.
4. ``merge_fragments`` (ref :242-245): 0.5/0.5 ``cv2.addWeighted`` blend.

Tie-breaking: the reference uses ``np.argsort(-diff.ravel())`` whose order for
equal scores is unspecified (introsort).  We define the spec as "lower flat
index wins", matching XLA's stable ``top_k``; parity at the fragment level is
therefore bit-exact except for score ties at the selection boundary, which the
reference itself does not pin down.

Everything here is statically shaped: for an ``(H, W)`` input the patch grid,
selection count ``k = min(top_n, n_patches)`` and canvas are compile-time
constants, so the ops batch and fuse under ``jit``/``vmap``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

PATCH_SIZE = 16
TARGET_SIZE = 224
TOP_N = (TARGET_SIZE // PATCH_SIZE) ** 2  # 196


def absdiff(a: jax.Array, b: jax.Array) -> jax.Array:
    """uint8 |a - b| without wraparound (``cv2.absdiff`` semantics)."""
    return jnp.maximum(a, b) - jnp.minimum(a, b)


def _patchify(img: jax.Array, patch_size: int) -> jax.Array:
    """(H, W, C) -> (n_patches, patch_size*patch_size*C), row-major patches.

    Crops to a multiple of patch_size first (ref ``get_patch_diff`` crop).
    Patches are FLAT rows (768 lanes for 16x16x3): trailing dims of (16,16,3)
    would be lane-padded 3 -> 128 on TPU (42x waste); flat rows tile cleanly
    and make the top-k gather pull contiguous 3KB slices.
    """
    h, w, c = img.shape
    hp, wp = h // patch_size, w // patch_size
    img = img[: hp * patch_size, : wp * patch_size]
    img = img.reshape(hp, patch_size, wp, patch_size, c)
    img = img.transpose(0, 2, 1, 3, 4)
    return img.reshape(hp * wp, patch_size * patch_size * c)


def patch_scores(residual: jax.Array, patch_size: int = PATCH_SIZE) -> jax.Array:
    """Per-patch sum of absolute residual, flattened row-major (int32).

    Matches ``get_patch_diff`` (ref :177-189): uint8 residuals are already
    non-negative so the sum is exact in int32 (max 16*16*3*255 < 2^18).
    """
    patches = _patchify(residual, patch_size)
    return jnp.sum(patches.astype(jnp.int32), axis=1)


def top_patch_indices(scores: jax.Array, top_n: int = TOP_N) -> jax.Array:
    """Indices of the top_n scores, ascending (row-major patch order).

    Ascending order == the reference's re-sort by (row, col)
    (ref ``extract_important_patches:193-195``).
    """
    k = min(top_n, scores.shape[0])
    _, idx = jax.lax.top_k(scores, k)
    return jnp.sort(idx)


def gather_fragment(
    img: jax.Array,
    patch_ids: jax.Array,
    patch_size: int = PATCH_SIZE,
    target_size: int = TARGET_SIZE,
) -> jax.Array:
    """Pack the selected patches of ``img`` raster-scan into a square canvas.

    Implements both ``extract_important_patches`` (on the residual) and
    ``get_original_frame_patches`` (on the original frame) — they differ only
    in which image is gathered; positions are shared (ref :212-230).
    """
    per_row = target_size // patch_size
    n_slots = per_row * per_row
    patches = _patchify(img, patch_size)
    k = patch_ids.shape[0]
    sel = jnp.take(patches, patch_ids, axis=0)  # (k, p*p*C) contiguous rows
    if k < n_slots:  # degenerate small frames: zero-fill remaining slots
        pad = jnp.zeros((n_slots - k, sel.shape[1]), sel.dtype)
        sel = jnp.concatenate([sel, pad], axis=0)
    c = img.shape[-1]
    canvas = sel.reshape(per_row, per_row, patch_size, patch_size, c)
    canvas = canvas.transpose(0, 2, 1, 3, 4)
    return canvas.reshape(target_size, target_size, c)


@functools.partial(jax.jit, static_argnames=("patch_size", "target_size", "top_n"))
def fragment_pair(
    residual: jax.Array,
    original: jax.Array,
    patch_size: int = PATCH_SIZE,
    target_size: int = TARGET_SIZE,
    top_n: int = TOP_N,
) -> tuple[jax.Array, jax.Array]:
    """Residual fragment + co-located original-frame fragment.

    One scoring pass drives both gathers (the reference recomputes positions
    through the filesystem; here it is a single fused XLA program).
    """
    scores = patch_scores(residual, patch_size)
    ids = top_patch_indices(scores, top_n)
    frag_res = gather_fragment(residual, ids, patch_size, target_size)
    frag_ori = gather_fragment(original, ids, patch_size, target_size)
    return frag_res, frag_ori


def merge_fragments(diff_frag: jax.Array, flow_frag: jax.Array) -> jax.Array:
    """0.5/0.5 blend with uint8 saturate-round (``cv2.addWeighted`` semantics,
    ref ``merge_fragments:242-245``). cv2 rounds half-to-even (cvRound), as
    does ``jnp.rint``."""
    out = 0.5 * diff_frag.astype(jnp.float32) + 0.5 * flow_frag.astype(jnp.float32)
    return jnp.clip(jnp.rint(out), 0, 255).astype(jnp.uint8)
