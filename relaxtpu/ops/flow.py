"""Farneback dense optical flow, TPU-native.

The reference calls ``cv2.calcOpticalFlowFarneback(prev, next, None,
0.5, 3, 15, 3, 5, 1.2, 0)`` (``/root/reference/src/main_fragment_layerstack.py:313-315``).
This module reimplements the Farneback algorithm (Farneback 2003, "Two-frame
motion estimation based on polynomial expansion") with OpenCV's parameter
conventions so the flow fields are numerically comparable:

- coarse-to-fine pyramid: each level blurs the *base* image with
  sigma = (1/scale - 1)/2 and resizes directly (INTER_LINEAR, no antialias);
- per-pixel quadratic polynomial expansion via six separable 1-D Gaussian
  moment correlations (replicate border);
- displacement update from the normal equations of the linearized constraint,
  averaged over a winsize x winsize box (replicate border), iterated
  ``iterations`` times per level with matrix re-estimation between iterations;
- a 5-pixel frame of confidence down-weighting at image borders.

Everything is statically shaped: the pyramid schedule is resolved at trace
time from the (static) image shape, so the whole flow computation is one XLA
program and batches with ``vmap``.  Computation is float32 (OpenCV accumulates
a few stages in float64; agreement is validated at the flow-field level in
``tests/test_flow.py`` and at the feature level downstream).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from relaxtpu.ops.warp import warp_planes_banded

_MIN_SIZE = 32  # OpenCV's minimum pyramid level size
_BORDER_W = (0.14, 0.14, 0.4472, 0.4472, 0.4472)  # edge confidence taper


def _cvround(x: float) -> int:
    """Round half to even, like cvRound."""
    return int(np.rint(x))


def _sep_correlate(img: jax.Array, kx: np.ndarray, ky: np.ndarray, mode: str) -> jax.Array:
    """Separable 2-D correlation of (H, W) with 1-D kernels, padded border.

    mode: 'edge' (BORDER_REPLICATE) or 'reflect' (BORDER_REFLECT_101).
    Kernels are correlation kernels (not flipped).

    Implemented as shifted multiply-adds (static slices of the padded array)
    on the VPU.  A 1-channel ``conv_general_dilated`` would land on the MXU
    with ~1/16000 utilization — these little correlations were a large share
    of the whole flow's runtime in that form.  Accumulation is plain f32
    (the moment sums are ~15 terms; validated <0.05px vs cv2 downstream).
    """
    ry = len(ky) // 2
    rx = len(kx) // 2
    pad_mode = "edge" if mode == "edge" else "reflect"
    x = jnp.pad(img, ((ry, ry), (rx, rx)), mode=pad_mode)
    h, w = img.shape
    if rx or len(kx) > 1:
        x = sum(
            float(kx[i]) * jax.lax.slice(x, (0, i), (x.shape[0], i + w))
            for i in range(len(kx))
        )
    else:
        x = float(kx[0]) * x
    if ry or len(ky) > 1:
        x = sum(
            float(ky[j]) * jax.lax.slice(x, (j, 0), (j + h, w))
            for j in range(len(ky))
        )
    else:
        x = float(ky[0]) * x
    return x


def _gaussian_kernel(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel semantics, including the sigma<=0 fixed tables."""
    small_tab = {
        1: [1.0],
        3: [0.25, 0.5, 0.25],
        5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
        7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
    }
    if sigma <= 0:
        if ksize in small_tab:
            return np.asarray(small_tab[ksize], np.float64)
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    c = (ksize - 1) * 0.5
    x = np.arange(ksize, dtype=np.float64) - c
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


def _resize_linear(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """INTER_LINEAR resize (half-pixel centers, no antialiasing)."""
    if img.shape[-2:] == out_hw and img.ndim == 2:
        return img
    out_shape = out_hw if img.ndim == 2 else (*out_hw, img.shape[-1])
    return jax.image.resize(img, out_shape, method="linear", antialias=False)


def _poly_exp_coeffs(n: int, sigma: float) -> tuple[np.ndarray, np.ndarray, np.ndarray, float, float, float, float]:
    """1-D Gaussian moment kernels and inverse-Gram coefficients.

    Basis [1, x, y, x^2, y^2, xy] with 2-D separable Gaussian weights; the
    Gram matrix inverse yields the four distinct coefficients used to map
    moment sums to polynomial coefficients.
    """
    x = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(x * x) / (2.0 * sigma * sigma))
    g /= g.sum()
    xg = x * g
    xxg = x * x * g
    # 2-D Gram matrix entries (separable, so sums factor)
    s0 = g.sum()               # = 1
    s2 = (x * x * g).sum()
    s4 = (x ** 4 * g).sum()
    G = np.zeros((6, 6))
    G[0, 0] = s0 * s0
    G[1, 1] = G[2, 2] = s2 * s0
    G[3, 3] = G[4, 4] = s4 * s0
    G[5, 5] = s2 * s2
    G[0, 3] = G[3, 0] = G[0, 4] = G[4, 0] = s2 * s0
    G[3, 4] = G[4, 3] = s2 * s2
    invG = np.linalg.inv(G)
    return g, xg, xxg, invG[1, 1], invG[0, 3], invG[3, 3], invG[5, 5]


def _poly_expansion(img: jax.Array, n: int, sigma: float) -> jax.Array:
    """Quadratic polynomial expansion -> (5, H, W) coefficient planes.

    Channels: [c_y, c_x, c_yy, c_xx, c_xy] (linear y/x, quadratic y^2/x^2/xy),
    computed from six separable moment correlations with replicate border.
    """
    g, xg, xxg, ig11, ig03, ig33, ig55 = _poly_exp_coeffs(n, sigma)
    # VPU shifted adds, NOT Toeplitz matmuls: measured 24.6 ms vs 30.3 for
    # the dense-MXU form per 16-pair 540p all-levels call — six 11-tap
    # passes waste ~87x FLOPs as dense (n, n) matrices, past the point
    # where the MXU's rate advantage over the VPU pays for it (the 15-tap
    # box blur, reused 3x per level, sits on the other side of that line).
    # vertical moment passes (correlation along y)
    v0 = _sep_correlate(img, np.array([1.0]), g, "edge")     # sum_y g f
    v1 = _sep_correlate(img, np.array([1.0]), xg, "edge")    # sum_y y g f
    v2 = _sep_correlate(img, np.array([1.0]), xxg, "edge")   # sum_y y^2 g f
    # horizontal moment passes (correlation along x)
    b1 = _sep_correlate(v0, g, np.array([1.0]), "edge")
    b2 = _sep_correlate(v0, xg, np.array([1.0]), "edge")
    b4 = _sep_correlate(v0, xxg, np.array([1.0]), "edge")
    b3 = _sep_correlate(v1, g, np.array([1.0]), "edge")
    b6 = _sep_correlate(v1, xg, np.array([1.0]), "edge")
    b5 = _sep_correlate(v2, g, np.array([1.0]), "edge")
    c_y = b3 * ig11
    c_x = b2 * ig11
    c_yy = b1 * ig03 + b5 * ig33
    c_xx = b1 * ig03 + b4 * ig33
    c_xy = b6 * ig55
    # channel-PLANAR layout (5, H, W): with channels minormost the TPU pads
    # 5 -> 128 lanes (25.6x HBM bloat); planar keeps (H, W) cleanly tiled.
    return jnp.stack([c_y, c_x, c_yy, c_xx, c_xy], axis=0)


def _border_scale(h: int, w: int) -> jax.Array:
    """(H, W) confidence taper: product of per-side 5-pixel ramps."""
    ramp = np.asarray(_BORDER_W, np.float32)
    k = len(ramp)

    def side(nn: int) -> np.ndarray:
        s = np.ones(nn, np.float32)
        m = min(k, nn)
        s[:m] *= ramp[:m]
        s[nn - m:] *= ramp[:m][::-1]
        return s

    return jnp.asarray(side(h)[:, None] * side(w)[None, :])


def _warp_exact(r1: jax.Array, flow: jax.Array) -> jax.Array:
    """Gather-based bilinear warp of planar (5, H, W) — exact but index-bound.

    Interleaves to (H, W, 5) first: the TPU lane-pads 5 -> 128 and gathers
    full 512B lane tiles per corner, measured 3.7x faster than flat
    per-plane takes.  Kept as the strict-parity fallback for the banded MXU
    warp (``relaxtpu.ops.warp``), which is ~6x faster again.
    """
    h, w = flow.shape[1:]
    r1i = jnp.transpose(r1, (1, 2, 0))
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    fx = xs + flow[0]
    fy = ys + flow[1]
    x1 = jnp.floor(fx)
    y1 = jnp.floor(fy)
    tx = fx - x1
    ty = fy - y1
    xi = jnp.clip(x1.astype(jnp.int32), 0, w - 2)
    yi = jnp.clip(y1.astype(jnp.int32), 0, h - 2)
    a00 = ((1 - tx) * (1 - ty))[..., None]
    a01 = (tx * (1 - ty))[..., None]
    a10 = ((1 - tx) * ty)[..., None]
    a11 = (tx * ty)[..., None]
    r1w = (
        a00 * r1i[yi, xi]
        + a01 * r1i[yi, xi + 1]
        + a10 * r1i[yi + 1, xi]
        + a11 * r1i[yi + 1, xi + 1]
    )
    return jnp.transpose(r1w, (2, 0, 1))


def _update_matrices(r0: jax.Array, r1: jax.Array, flow: jax.Array, warp: str) -> jax.Array:
    """Per-pixel normal-equation planes M = (5, H, W) = [G11, G12, G22, h1, h2].

    Warps the next-frame expansion by the current flow (bilinear), averages
    quadratic terms, differences linear terms, and forms A^T A / A^T b for the
    2x2 displacement solve.  Outside-image warps fall back to the prev-frame
    quadratic terms with zeroed linear difference (OpenCV behavior).

    r0/r1 are channel-planar (5, H, W); flow is planar (2, H, W).  ``warp``
    selects the bilinear warp implementation: 'banded' = one-hot MXU matmul
    (``relaxtpu.ops.warp``: |dx| <= 64 and any coherent dy exact — beyond
    the ~52 px composite displacement these Farneback parameters can track;
    the dominant cost of the whole flow computation), 'exact' = XLA gather
    (unconditionally exact, ~6x slower on TPU).
    """
    h, w = flow.shape[1:]
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    dx = flow[0]
    dy = flow[1]
    x1 = jnp.floor(xs + dx)
    y1 = jnp.floor(ys + dy)
    inside = (x1 >= 0) & (x1 <= w - 2) & (y1 >= 0) & (y1 <= h - 2)

    if warp == "banded":
        r1w = warp_planes_banded(r1, flow)
    else:
        r1w = _warp_exact(r1, flow)

    r2_in = (r0[0] - r1w[0]) * 0.5
    r3_in = (r0[1] - r1w[1]) * 0.5
    r4_in = (r0[2] + r1w[2]) * 0.5
    r5_in = (r0[3] + r1w[3]) * 0.5
    r6_in = (r0[4] + r1w[4]) * 0.25

    r2 = jnp.where(inside, r2_in, r0[0] * 0.5)
    r3 = jnp.where(inside, r3_in, r0[1] * 0.5)
    r4 = jnp.where(inside, r4_in, r0[2])
    r5 = jnp.where(inside, r5_in, r0[3])
    r6 = jnp.where(inside, r6_in, r0[4] * 0.5)

    r2 = r2 + r4 * dy + r6 * dx
    r3 = r3 + r6 * dy + r5 * dx

    scale = _border_scale(h, w)
    r2 = r2 * scale
    r3 = r3 * scale
    r4 = r4 * scale
    r5 = r5 * scale
    r6 = r6 * scale

    m0 = r4 * r4 + r6 * r6
    m1 = (r4 + r5) * r6
    m2 = r5 * r5 + r6 * r6
    m3 = r4 * r2 + r6 * r3
    m4 = r6 * r2 + r5 * r3
    return jnp.stack([m0, m1, m2, m3, m4], axis=0)


def _toeplitz_matrices(kernels: np.ndarray, n: int, mode: str) -> jax.Array:
    """(K, n, n) bordered Toeplitz correlation matrices T[k, i, s] =
    sum_j kernels[k, j] * [s == border(i + j - r)], built on device from
    iota compares (only the static per-tap coefficients are baked — the
    remote-compile tunnel rejects programs with fat constants).

    mode 'edge' clamps out-of-range source indices (BORDER_REPLICATE);
    'reflect' mirrors them excluding the edge (BORDER_REFLECT_101)."""
    nk, taps = kernels.shape
    r = taps // 2
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    s = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    t = jnp.zeros((nk, n, n), jnp.float32)
    for j in range(taps):
        src = i + j - r
        if mode == "edge":
            src = jnp.clip(src, 0, n - 1)
        else:
            src = jnp.where(src < 0, -src, src)
            src = jnp.where(src > n - 1, 2 * (n - 1) - src, src)
        mask = (s == src).astype(jnp.float32)
        t = t + jnp.asarray(kernels[:, j].astype(np.float32))[:, None, None] * mask
    return t


def _toeplitz_correlate(x: jax.Array, kernels, axis: int, mode: str) -> jax.Array:
    """Batched 1-D correlations along one of the last two axes of ``x`` as
    dense Toeplitz matmuls on the MXU -> (K, *x.shape).

    ``kernels`` is a static (K, taps) array; ``mode`` is 'edge'
    (BORDER_REPLICATE) or 'reflect' (BORDER_REFLECT_101).  Dense (n, n)
    matrices waste ~n/taps of the MXU's FLOPs on structural zeros but beat
    every form that materializes intermediates — these stages are
    HBM-bound, not FLOP-bound (measured per 16-pair 540p box-blur call:
    VPU shifted adds 8.5 ms, blocked band-slab einsum 12.0 ms, dense 6.4 ms).
    DEFAULT precision (1-pass bf16 on TPU, plain f32 on CPU): on-chip the
    flow-vs-cv2 error rises to mean 9.5e-4 / p99 3.5e-3 px — 14x inside the
    0.05 px parity tolerance — and the full 16-pair 540p farneback_flow
    drops 90.7 -> 83.9 ms vs HIGH (scripts/exp_box_prec.py)."""
    kernels = np.atleast_2d(np.asarray(kernels, np.float64))
    n = x.shape[axis]
    t = _toeplitz_matrices(kernels, n, mode)
    if axis % x.ndim == x.ndim - 2:
        return jnp.einsum("kyh,...hw->k...yw", t, x)
    return jnp.einsum("kxw,...w->k...x", t, x)


def _box_blur(m: jax.Array, winsize: int) -> jax.Array:
    """winsize x winsize box sum with replicate border; m is (C, H, W)."""
    ones = np.ones((1, winsize))
    v = _toeplitz_correlate(m, ones, axis=-2, mode="edge")[0]
    return _toeplitz_correlate(v, ones, axis=-1, mode="edge")[0]


def _update_flow(m: jax.Array, winsize: int) -> jax.Array:
    """Solve the box-averaged 2x2 system -> new planar flow (2, H, W)."""
    s = 1.0 / (winsize * winsize)
    mb = _box_blur(m, winsize) * s
    g11 = mb[0]
    g12 = mb[1]
    g22 = mb[2]
    h1 = mb[3]
    h2 = mb[4]
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    new_dx = (g11 * h2 - g12 * h1) * idet
    new_dy = (g22 * h1 - g12 * h2) * idet
    return jnp.stack([new_dx, new_dy], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "pyr_scale", "levels", "winsize", "iterations", "poly_n", "poly_sigma", "warp",
    ),
)
def farneback_flow(
    prev_gray: jax.Array,
    next_gray: jax.Array,
    pyr_scale: float = 0.5,
    levels: int = 3,
    winsize: int = 15,
    iterations: int = 3,
    poly_n: int = 5,
    poly_sigma: float = 1.2,
    warp: str = "banded",
) -> jax.Array:
    """Dense flow (H, W, 2) float32 from two grayscale images (uint8 or float).

    ``warp``: 'banded' (MXU one-hot warp: exact for |dx| <= 64 px and any
    coherent vertical motion — beyond what these parameters can track; the
    fast default) or 'exact' (XLA gather, unconditionally exact, ~6x slower).
    """
    h, w = prev_gray.shape
    prev_f = prev_gray.astype(jnp.float32)
    next_f = next_gray.astype(jnp.float32)

    # usable pyramid depth (static)
    lv = levels
    scale = 1.0
    for k in range(levels):
        scale *= pyr_scale
        if w * scale < _MIN_SIZE or h * scale < _MIN_SIZE:
            lv = k
            break

    flow = None
    for k in range(lv, -1, -1):
        scale = pyr_scale ** k
        hk = _cvround(h * scale)
        wk = _cvround(w * scale)
        sigma = (1.0 / scale - 1.0) * 0.5
        smooth_sz = max(_cvround(sigma * 5) | 1, 3)
        gk = _gaussian_kernel(smooth_sz, sigma)

        # prev/next smoothed + expanded as ONE batch of 2: the doubled batch
        # vectorizes the VPU shifted-add correlations ~2.8x better per image
        # (roofline: 16 imgs 6.73 ms vs 32 imgs 4.72 ms per poly-expansion
        # call at 540p; scripts/flow_roofline.py).  VPU shifted adds, NOT
        # Toeplitz matmuls: measured 8.5 ms vs 10.0 for the MXU form.
        base2 = jnp.stack([prev_f, next_f])
        im2 = jax.vmap(lambda b: _sep_correlate(b, gk, gk, "reflect"))(base2)
        im2 = jax.vmap(lambda b: _resize_linear(b, (hk, wk)))(im2)
        r2 = jax.vmap(lambda b: _poly_expansion(b, poly_n, poly_sigma))(im2)
        r0, r1 = r2[0], r2[1]

        if flow is None:
            flow = jnp.zeros((2, hk, wk), jnp.float32)
        else:
            flow = jax.image.resize(
                flow, (2, hk, wk), method="linear", antialias=False
            ) * (1.0 / pyr_scale)

        m = _update_matrices(r0, r1, flow, warp)
        for i in range(iterations):
            flow = _update_flow(m, winsize)
            if i < iterations - 1:
                m = _update_matrices(r0, r1, flow, warp)
    # planar (2, H, W) internally (clean TPU tiling); (H, W, 2) API
    return jnp.transpose(flow, (1, 2, 0))
