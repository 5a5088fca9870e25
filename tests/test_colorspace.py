"""Colorspace ops vs OpenCV golden values."""
import numpy as np
import pytest

import jax.numpy as jnp

from relaxtpu.ops import bgr_to_gray, flow_to_bgr

cv2 = pytest.importorskip("cv2")


def test_bgr_to_gray_exact(rng):
    img = rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
    got = np.asarray(bgr_to_gray(jnp.asarray(img)))
    want = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    np.testing.assert_array_equal(got, want)


def oracle_flow_to_rgb(flow):
    """Reference flow_to_rgb (main_fragment_layerstack.py:162-175) semantics."""
    mag, ang = cv2.cartToPolar(flow[..., 0], flow[..., 1])
    hue = ang * 180 / np.pi / 2
    hsv = np.zeros((flow.shape[0], flow.shape[1], 3), dtype=np.uint8)
    hsv[..., 0] = hue
    hsv[..., 1] = 255
    hsv[..., 2] = cv2.normalize(mag, None, 0, 255, cv2.NORM_MINMAX)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)


def test_flow_to_bgr_close_to_cv2(rng):
    flow = rng.normal(0, 3, (96, 128, 2)).astype(np.float32)
    got = np.asarray(flow_to_bgr(jnp.asarray(flow))).astype(np.int32)
    want = oracle_flow_to_rgb(flow).astype(np.int32)
    # cv2.cartToPolar uses a fast atan approximation (~0.3 deg error), which can
    # shift the uint8 hue by 1 and cascade into the BGR conversion; allow a
    # small fraction of pixels to differ by small amounts.
    diff = np.abs(got - want).max(axis=-1)
    assert (diff == 0).mean() > 0.85
    assert np.percentile(diff, 99) <= 16
    assert np.median(diff) == 0


def test_flow_to_bgr_zero_flow():
    flow = np.zeros((32, 32, 2), np.float32)
    got = np.asarray(flow_to_bgr(jnp.asarray(flow)))
    want = oracle_flow_to_rgb(flow)
    np.testing.assert_array_equal(got, want)


def test_yuv420_device_matches_host_bit_exact(rng):
    """ops.colorspace.yuv420_to_bgr == io.video._yuv420_to_bgr_limited."""
    import jax.numpy as jnp

    from relaxtpu.io.video import _yuv420_to_bgr_limited
    from relaxtpu.ops.colorspace import bgr_to_yuv420, yuv420_to_bgr

    h, w = 96, 128
    bgr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    y, u, v = bgr_to_yuv420(bgr)
    stacked = np.concatenate([y, u.reshape(h // 4, w), v.reshape(h // 4, w)], axis=0)
    want = _yuv420_to_bgr_limited(stacked, w, h)
    got = np.asarray(yuv420_to_bgr(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)))
    np.testing.assert_array_equal(got, want)


def test_yuv420_roundtrip_close(rng):
    """BGR -> I420 -> BGR stays within chroma-subsampling error."""
    import jax.numpy as jnp

    from relaxtpu.ops.colorspace import bgr_to_yuv420, yuv420_to_bgr

    bgr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8).astype(np.float32)
    # smooth the chroma so 4:2:0 subsampling is near-lossless
    import scipy.ndimage as ndi

    bgr = ndi.gaussian_filter(bgr, (3, 3, 0)).astype(np.uint8)
    y, u, v = bgr_to_yuv420(bgr)
    back = np.asarray(yuv420_to_bgr(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)))
    assert np.abs(back.astype(int) - bgr.astype(int)).mean() < 6
