"""Color-space ops matching OpenCV's uint8 math.

The reference leans on cv2 (C++) for grayscale conversion, flow
magnitude/angle, min-max normalization and HSV->BGR
(``/root/reference/src/main_fragment_layerstack.py:162-175,313-315``).  These
are reimplemented as elementwise jnp ops so they fuse into the frame-pair XLA
program; uint8 rounding/truncation follows OpenCV exactly where it is
deterministic (fixed-point gray, truncating uint8 stores, cvRound
half-to-even) so fragments stay bit-comparable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bgr_to_gray(img_u8: jax.Array) -> jax.Array:
    """cv2.COLOR_BGR2GRAY with OpenCV's 15-bit fixed-point coefficients.

    y = (B*3735 + G*19235 + R*9798 + 2^14) >> 15, inputs uint8 BGR
    (bit-exact vs cv2 5.x, verified in tests/test_colorspace.py).
    """
    b = img_u8[..., 0].astype(jnp.int32)
    g = img_u8[..., 1].astype(jnp.int32)
    r = img_u8[..., 2].astype(jnp.int32)
    y = (b * 3735 + g * 19235 + r * 9798 + (1 << 14)) >> 15
    return y.astype(jnp.uint8)


def minmax_normalize_255(x: jax.Array) -> jax.Array:
    """cv2.normalize(..., 0, 255, NORM_MINMAX): all-zeros when max == min."""
    lo = jnp.min(x)
    hi = jnp.max(x)
    scale = jnp.where(hi > lo, 255.0 / (hi - lo), 0.0)
    return (x - lo) * scale


def hsv_to_bgr_u8(h_u8: jax.Array, s_u8: jax.Array, v_u8: jax.Array) -> jax.Array:
    """cv2.COLOR_HSV2BGR for uint8 (H in 0..180).

    Sector decomposition identical to OpenCV's HSV2RGB: h6 = H*6/180,
    p/q/t interpolants. cv2's 8U path truncates the float result (verified
    exhaustively in tests: floor matches 99.6% exactly, max off-by-one from
    float32 association order).
    """
    h6 = h_u8.astype(jnp.float32) * (6.0 / 180.0)
    sector = jnp.floor(h6).astype(jnp.int32) % 6
    f = h6 - jnp.floor(h6)
    s = s_u8.astype(jnp.float32) / 255.0
    v = v_u8.astype(jnp.float32)
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    # RGB per sector: 0:(v,t,p) 1:(q,v,p) 2:(p,v,t) 3:(p,q,v) 4:(t,p,v) 5:(v,p,q)
    # select chains instead of stacked tables + take_along_axis: a trailing
    # dim of 6 would be lane-padded 6 -> 128 on TPU (21x VPU/HBM waste).
    conds = [sector == i for i in range(6)]

    def pick(tab):
        out = tab[5]
        for i in range(4, -1, -1):
            out = jnp.where(conds[i], tab[i], out)
        return out

    r = pick((v, q, p, p, t, v))
    g = pick((t, v, v, q, p, p))
    b = pick((p, p, t, v, v, q))
    bgr = jnp.stack([b, g, r], axis=-1)
    return jnp.clip(jnp.floor(bgr), 0, 255).astype(jnp.uint8)


def flow_to_bgr(flow: jax.Array) -> jax.Array:
    """Flow-field visualization image (``flow_to_rgb``, ref :162-175).

    hue = angle (atan2 in [0, 2pi)) mapped to 0..180, sat = 255,
    val = min-max-normalized magnitude; then uint8 HSV->BGR.  The reference
    stores hue/val into a uint8 array by numpy assignment, which truncates —
    reproduced here.  (The reference name says "rgb" but cv2 returns BGR.)
    """
    fx = flow[..., 0]
    fy = flow[..., 1]
    mag = jnp.sqrt(fx * fx + fy * fy)
    ang = jnp.arctan2(fy, fx)
    ang = jnp.where(ang < 0, ang + 2.0 * jnp.pi, ang)
    hue = ang * (180.0 / jnp.pi / 2.0)
    val = minmax_normalize_255(mag)
    h_u8 = jnp.clip(jnp.floor(hue), 0, 255).astype(jnp.uint8)  # truncating store
    v_u8 = jnp.clip(jnp.floor(val), 0, 255).astype(jnp.uint8)
    s_u8 = jnp.full_like(h_u8, 255)
    return hsv_to_bgr_u8(h_u8, s_u8, v_u8)


def yuv420_to_bgr(y: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """BT.601 limited-range I420 -> BGR uint8, on device.

    Bit-matches the host converter ``relaxtpu.io.video._yuv420_to_bgr_limited``
    (which itself matches ffmpeg/sws defaults: nearest 2x2 chroma,
    float BT.601 limited-range matrix, round-to-nearest) so the same video
    produces the same frames whether colorspace conversion runs on the host
    or fused into the device program.  Moving it on-device halves the
    host->device transfer (YUV420 is 1.5 bytes/px vs 3 for BGR) — that
    transfer is a first-class cost of the serving pipeline.

    y: (..., H, W) uint8; u, v: (..., H/2, W/2) uint8 -> (..., H, W, 3) uint8.
    """
    h, w = y.shape[-2:]

    def upsample(c):
        # nearest doubling: one chroma sample per 2x2 luma block, matching
        # swscale's unscaled yuv420p->rgb fast path (the reference's ffmpeg
        # PNG dumps and our native decoder's BGR output go through it)
        c = c.astype(jnp.float32)
        return jnp.repeat(jnp.repeat(c, 2, axis=-2), 2, axis=-1)

    yl = 1.164383 * (y.astype(jnp.float32) - 16.0)
    uu = upsample(u) - 128.0
    vv = upsample(v) - 128.0
    b = yl + 2.017232 * uu
    g = yl - 0.812968 * vv - 0.391762 * uu
    r = yl + 1.596027 * vv
    bgr = jnp.stack([b, g, r], axis=-1)
    return jnp.clip(jnp.rint(bgr), 0, 255).astype(jnp.uint8)


def bgr_to_yuv420(img_u8) -> tuple:
    """Host-side inverse (numpy): BGR uint8 -> (y, u, v) I420 planes.

    BT.601 limited-range with 2x2 chroma averaging; used by the benchmark to
    stage realistic decoder output and by tests as the round-trip partner of
    :func:`yuv420_to_bgr`.
    """
    import numpy as np

    img = np.asarray(img_u8, dtype=np.float32)
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    yf = 0.257 * r + 0.504 * g + 0.098 * b + 16.0
    uf = -0.148 * r - 0.291 * g + 0.439 * b + 128.0
    vf = 0.439 * r - 0.368 * g - 0.071 * b + 128.0
    sub = lambda c: (
        c[..., 0::2, 0::2] + c[..., 0::2, 1::2] + c[..., 1::2, 0::2] + c[..., 1::2, 1::2]
    ) * 0.25
    to_u8 = lambda c: np.clip(np.rint(c), 0, 255).astype(np.uint8)
    return to_u8(yf), to_u8(sub(uf)), to_u8(sub(vf))


def unpack_i420(buf: jax.Array, h: int, w: int) -> tuple:
    """(n, H*W*3/2) packed I420 -> (y, u, v) plane views, on device.

    Inverse of the packed layout ``native.NativeDecoder.decode_selected_i420``
    emits (per frame: luma, then U, then V) — free reshapes/slices in XLA.
    """
    yb = h * w
    cb = (h // 2) * (w // 2)
    y = buf[:, :yb].reshape(-1, h, w)
    u = buf[:, yb : yb + cb].reshape(-1, h // 2, w // 2)
    v = buf[:, yb + cb :].reshape(-1, h // 2, w // 2)
    return y, u, v


def pack_i420(y, u, v):
    """Host-side inverse of :func:`unpack_i420` (numpy): planes -> packed."""
    import numpy as np

    n = y.shape[0]
    return np.concatenate(
        [
            np.asarray(y).reshape(n, -1),
            np.asarray(u).reshape(n, -1),
            np.asarray(v).reshape(n, -1),
        ],
        axis=1,
    )
