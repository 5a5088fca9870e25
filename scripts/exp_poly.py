"""Poly-expansion formulation experiment: fused shifted-adds vs Toeplitz matmul.

Checks numerics vs the current implementation on CPU, and (on TPU) times the
three formulations per 32-image 540p batch.

Usage:
  JAX_PLATFORMS=cpu PYTHONPATH='' python scripts/exp_poly.py check
  python scripts/exp_poly.py time
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from relaxtpu.ops.flow import _poly_exp_coeffs, _poly_expansion

H, W = 540, 960
N = 32
ITERS = 8


def poly_fused(img, n=5, sigma=1.2):
    """Same math as _poly_expansion but one padded buffer per axis pass and
    every slice reused across all kernels (3 vertical, then 6 horizontal
    accumulators over a stacked (3, H, W) buffer)."""
    g, xg, xxg, ig11, ig03, ig33, ig55 = _poly_exp_coeffs(n, sigma)
    h, w = img.shape
    r = n
    xp = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    sl = [jax.lax.slice(xp, (j, 0), (j + h, w)) for j in range(2 * r + 1)]
    v0 = sum(float(g[j]) * sl[j] for j in range(2 * r + 1))
    v1 = sum(float(xg[j]) * sl[j] for j in range(2 * r + 1))
    v2 = sum(float(xxg[j]) * sl[j] for j in range(2 * r + 1))
    V = jnp.stack([v0, v1, v2])  # (3, H, W)
    Vp = jnp.pad(V, ((0, 0), (0, 0), (r, r)), mode="edge")
    tl = [jax.lax.slice(Vp, (0, 0, j), (3, h, j + w)) for j in range(2 * r + 1)]
    b1 = sum(float(g[j]) * tl[j][0] for j in range(2 * r + 1))
    b2 = sum(float(xg[j]) * tl[j][0] for j in range(2 * r + 1))
    b4 = sum(float(xxg[j]) * tl[j][0] for j in range(2 * r + 1))
    b3 = sum(float(g[j]) * tl[j][1] for j in range(2 * r + 1))
    b6 = sum(float(xg[j]) * tl[j][1] for j in range(2 * r + 1))
    b5 = sum(float(g[j]) * tl[j][2] for j in range(2 * r + 1))
    c_y = b3 * ig11
    c_x = b2 * ig11
    c_yy = b1 * ig03 + b5 * ig33
    c_xx = b1 * ig03 + b4 * ig33
    c_xy = b6 * ig55
    return jnp.stack([c_y, c_x, c_yy, c_xx, c_xy], axis=0)


def _toeplitz(n_out, kern, transpose=False):
    """Replicate-border correlation matrix built ON DEVICE from iota
    (no multi-MB constants baked into the program)."""
    r = len(kern) // 2
    i = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_out), 0)  # out row
    s = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_out), 1)  # src col
    T = jnp.zeros((n_out, n_out), jnp.float32)
    for j, kj in enumerate(kern):
        src = jnp.clip(i + j - r, 0, n_out - 1)
        T = T + jnp.float32(kj) * (s == src)
    return T.T if transpose else T


def poly_matmul(img, n=5, sigma=1.2, precision=jax.lax.Precision.HIGHEST):
    g, xg, xxg, ig11, ig03, ig33, ig55 = _poly_exp_coeffs(n, sigma)
    h, w = img.shape
    Ty = jnp.concatenate(
        [_toeplitz(h, k) for k in (g, xg, xxg)], axis=0
    )  # (3H, H): correlate along y for all three kernels
    Tx = jnp.concatenate(
        [_toeplitz(w, k).T for k in (g, xg, xxg)], axis=1
    )  # (W, 3W)
    V = jax.lax.dot(Ty, img, precision=precision).reshape(3, h, w)
    B = jnp.einsum("vhw,wx->vhx", V, Tx, precision=precision).reshape(3, h, 3, w)
    b1, b2, b4 = B[0, :, 0], B[0, :, 1], B[0, :, 2]
    b3, b6 = B[1, :, 0], B[1, :, 1]
    b5 = B[2, :, 0]
    c_y = b3 * ig11
    c_x = b2 * ig11
    c_yy = b1 * ig03 + b5 * ig33
    c_xx = b1 * ig03 + b4 * ig33
    c_xy = b6 * ig55
    return jnp.stack([c_y, c_x, c_yy, c_xx, c_xy], axis=0)


def poly_hybrid(img, n=5, sigma=1.2, precision=jax.lax.Precision.HIGHEST):
    """Vertical moments as sublane shifted-adds (cheap: no lane crossing),
    horizontal moments as ONE Toeplitz matmul on the MXU (lane shifts are the
    expensive part of the shifted-add form)."""
    g, xg, xxg, ig11, ig03, ig33, ig55 = _poly_exp_coeffs(n, sigma)
    h, w = img.shape
    r = n
    xp = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    sl = [jax.lax.slice(xp, (j, 0), (j + h, w)) for j in range(2 * r + 1)]
    v0 = sum(float(g[j]) * sl[j] for j in range(2 * r + 1))
    v1 = sum(float(xg[j]) * sl[j] for j in range(2 * r + 1))
    v2 = sum(float(xxg[j]) * sl[j] for j in range(2 * r + 1))
    V = jnp.stack([v0, v1, v2])  # (3, H, W)
    Tx = jnp.concatenate(
        [_toeplitz(w, k).T for k in (g, xg, xxg)], axis=1
    )  # (W, 3W)
    B = jnp.einsum("vhw,wx->vhx", V, Tx, precision=precision).reshape(3, h, 3, w)
    b1, b2, b4 = B[0, :, 0], B[0, :, 1], B[0, :, 2]
    b3, b6 = B[1, :, 0], B[1, :, 1]
    b5 = B[2, :, 0]
    c_y = b3 * ig11
    c_x = b2 * ig11
    c_yy = b1 * ig03 + b5 * ig33
    c_xx = b1 * ig03 + b4 * ig33
    c_xy = b6 * ig55
    return jnp.stack([c_y, c_x, c_yy, c_xx, c_xy], axis=0)


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.float32))
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"

    if mode == "check":
        ref = np.asarray(_poly_expansion(img, 5, 1.2))
        for name, fn in [
            ("fused", poly_fused),
            ("matmul-HIGHEST", lambda x: poly_matmul(x)),
            ("matmul-HIGH", lambda x: poly_matmul(x, precision=jax.lax.Precision.HIGH)),
            (
                "matmul-DEFAULT",
                lambda x: poly_matmul(x, precision=jax.lax.Precision.DEFAULT),
            ),
        ]:
            got = np.asarray(fn(img))
            d = np.abs(got - ref)
            rel = d / (np.abs(ref) + 1e-3)
            print(f"{name:16s} maxabs={d.max():.3e} meanrel={rel.mean():.3e}")
        return

    imgs = jnp.asarray(rng.integers(0, 256, (N, H, W)).astype(np.float32))
    for name, fn in [
        ("current", lambda x: _poly_expansion(x, 5, 1.2)),
        ("fused", poly_fused),
        ("matmul-HIGHEST", lambda x: poly_matmul(x)),
        ("matmul-HIGH", lambda x: poly_matmul(x, precision=jax.lax.Precision.HIGH)),
        ("matmul-DEFAULT", lambda x: poly_matmul(x, precision=jax.lax.Precision.DEFAULT)),
        ("hybrid-HIGHEST", lambda x: poly_hybrid(x)),
        ("hybrid-HIGH", lambda x: poly_hybrid(x, precision=jax.lax.Precision.HIGH)),
        ("hybrid-DEFAULT", lambda x: poly_hybrid(x, precision=jax.lax.Precision.DEFAULT)),
    ]:
        vf = jax.vmap(fn)

        @jax.jit
        def chained(p):
            def body(c, _):
                out = vf(p + c * 1e-30)
                return c + out.ravel()[0] * 1e-30, None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return c

        float(np.asarray(chained(imgs)))
        t0 = time.perf_counter()
        float(np.asarray(chained(imgs)))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{name:16s} {dt:7.2f} ms / {N}-img batch")


if __name__ == "__main__":
    main()
