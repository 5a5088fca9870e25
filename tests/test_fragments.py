"""Golden tests for fragment ops against an independent numpy oracle that
follows the reference semantics (main_fragment_layerstack.py:177-245)."""
import numpy as np
import pytest

import jax.numpy as jnp

from relaxtpu.ops import (
    absdiff,
    fragment_pair,
    gather_fragment,
    merge_fragments,
    patch_scores,
    top_patch_indices,
)


def oracle_patch_diff(residual, patch_size):
    h, w = residual.shape[:2]
    h_adj = (h // patch_size) * patch_size
    w_adj = (w // patch_size) * patch_size
    res = residual[:h_adj, :w_adj]
    diff = np.zeros((h_adj // patch_size, w_adj // patch_size))
    for i in range(0, h_adj, patch_size):
        for j in range(0, w_adj, patch_size):
            diff[i // patch_size, j // patch_size] = np.sum(
                np.abs(res[i : i + patch_size, j : j + patch_size].astype(np.int64))
            )
    return diff


def oracle_extract(residual, diff, patch_size=16, target_size=224, top_n=196):
    # stable argsort so ties resolve to lowest flat index (the declared spec)
    order = np.argsort(-diff.ravel(), kind="stable")
    idx = np.unravel_index(order, diff.shape)
    top = list(zip(idx[0][:top_n], idx[1][:top_n]))
    top = sorted(top, key=lambda t: (t[0], t[1]))
    out = np.zeros((target_size, target_size, residual.shape[2]), residual.dtype)
    per_row = target_size // patch_size
    positions = []
    for k, (y, x) in enumerate(top):
        p = residual[y * patch_size : (y + 1) * patch_size, x * patch_size : (x + 1) * patch_size]
        r, c = k // per_row, k % per_row
        out[r * patch_size : (r + 1) * patch_size, c * patch_size : (c + 1) * patch_size] = p
        positions.append((y, x))
    return out, positions


def oracle_original_patches(original, positions, patch_size, target_size):
    out = np.zeros((target_size, target_size, original.shape[2]), original.dtype)
    per_row = target_size // patch_size
    for k, (y, x) in enumerate(positions):
        p = original[y * patch_size : (y + 1) * patch_size, x * patch_size : (x + 1) * patch_size]
        r, c = k // per_row, k % per_row
        out[r * patch_size : (r + 1) * patch_size, c * patch_size : (c + 1) * patch_size] = p
    return out


@pytest.fixture
def frame_pair(rng):
    h, w = 540, 960
    a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    b = np.clip(a.astype(np.int32) + rng.integers(-30, 30, (h, w, 3)), 0, 255).astype(np.uint8)
    return a, b


def test_absdiff_matches_cv2(frame_pair):
    cv2 = pytest.importorskip("cv2")
    a, b = frame_pair
    np.testing.assert_array_equal(np.asarray(absdiff(jnp.asarray(a), jnp.asarray(b))), cv2.absdiff(a, b))


def test_patch_scores_match_oracle(frame_pair):
    a, b = frame_pair
    res = np.abs(a.astype(np.int32) - b.astype(np.int32)).astype(np.uint8)
    got = np.asarray(patch_scores(jnp.asarray(res)))
    want = oracle_patch_diff(res, 16).ravel()
    np.testing.assert_array_equal(got, want.astype(np.int64))


def test_fragment_pair_matches_oracle(frame_pair):
    a, b = frame_pair
    res = np.abs(a.astype(np.int32) - b.astype(np.int32)).astype(np.uint8)
    frag_res, frag_ori = fragment_pair(jnp.asarray(res), jnp.asarray(a))
    diff = oracle_patch_diff(res, 16)
    want_res, positions = oracle_extract(res, diff)
    want_ori = oracle_original_patches(a, positions, 16, 224)
    np.testing.assert_array_equal(np.asarray(frag_res), want_res)
    np.testing.assert_array_equal(np.asarray(frag_ori), want_ori)


def test_top_indices_tie_break_lowest_first():
    scores = jnp.asarray(np.array([5, 9, 9, 1, 9, 9, 9], np.int32))
    ids = np.asarray(top_patch_indices(scores, top_n=3))
    np.testing.assert_array_equal(ids, [1, 2, 4])


def test_gather_fragment_pads_small_frames(rng):
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)  # 16 patches < 196
    scores = patch_scores(jnp.asarray(img))
    ids = top_patch_indices(scores)
    frag = np.asarray(gather_fragment(jnp.asarray(img), ids))
    assert frag.shape == (224, 224, 3)
    # first row of slots contains all 16 patches in row-major order, rest zero
    np.testing.assert_array_equal(frag[:16, :16], img[:16, :16])
    assert frag[32:].sum() == 0


def test_merge_fragments_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    a = rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)
    got = np.asarray(merge_fragments(jnp.asarray(a), jnp.asarray(b)))
    want = cv2.addWeighted(a, 0.5, b, 0.5, 0)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1  # rounding-mode slack
    assert (got != want).mean() < 0.01
