"""Box-blur matmul precision probe: HIGH (3-pass bf16, current) vs DEFAULT
(1-pass bf16) inside the Farneback flow.

The 15x15 box sum runs as dense bordered-Toeplitz matmuls on the MXU
(`relaxtpu/ops/flow.py:_toeplitz_correlate`).  HIGH costs 3x the matmul
passes of DEFAULT; this probe measures (a) the flow-field error vs cv2 with
each setting on real TPU numerics, and (b) the per-16-pair-540p timing
delta, to decide whether DEFAULT's extra rounding stays inside the 0.05 px
parity tolerance with enough margin to take the speedup.

Usage: python scripts/exp_box_prec.py [pairs] [iters]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from relaxtpu.ops import flow as F

PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
H, W = 540, 960
REF = dict(pyr_scale=0.5, levels=3, winsize=15, iterations=3, poly_n=5,
           poly_sigma=1.2)


def patched_toeplitz(precision):
    base_mats = F._toeplitz_matrices

    def corr(x, kernels, axis, mode):
        kernels = np.atleast_2d(np.asarray(kernels, np.float64))
        n = x.shape[axis]
        t = base_mats(kernels, n, mode)
        if axis % x.ndim == x.ndim - 2:
            return jnp.einsum("kyh,...hw->k...yw", t, x, precision=precision)
        return jnp.einsum("kxw,...w->k...x", t, x, precision=precision)

    return corr


def textured(rng, h, w, sigma=1.5):
    from scipy.ndimage import gaussian_filter

    return gaussian_filter(
        rng.normal(0, 60, (h, w)).astype(np.float32), sigma
    ) + 128


def flow_err_vs_cv2(warp_prec_label, rng):
    import cv2

    errs = {}
    # shifted pair
    big = textured(rng, 140, 180)
    prev = np.clip(big[8:-12, 8:-12], 0, 255).astype(np.uint8)
    nxt = np.clip(big[7:-13, 6:-14], 0, 255).astype(np.uint8)
    pairs = {"shift": (prev, nxt)}
    # noisy pair
    p2 = np.clip(textured(rng, 120, 144, 2.0), 0, 255).astype(np.uint8)
    n2 = np.clip(p2 + rng.normal(0, 4, p2.shape), 0, 255).astype(np.uint8)
    pairs["noisy"] = (p2, n2)
    for name, (a, b) in pairs.items():
        want = cv2.calcOpticalFlowFarneback(a, b, None, 0.5, 3, 15, 3, 5, 1.2, 0)
        got = np.asarray(F.farneback_flow(jnp.asarray(a), jnp.asarray(b), **REF))
        s = 24
        e = np.abs(got[s:-s, s:-s] - want[s:-s, s:-s])
        errs[name] = (float(e.mean()), float(np.percentile(e, 99)))
    print(f"  [{warp_prec_label}] flow-vs-cv2 err (mean, p99): {errs}")
    return errs


def timed(label, fn, *args):
    @jax.jit
    def chained(*xs):
        def body(c, _):
            out = fn(xs[0] + c * 1e-30, xs[1])
            return c + out.ravel()[0] * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return c

    float(np.asarray(chained(*args)))
    t0 = time.perf_counter()
    float(np.asarray(chained(*args)))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"  {label:40s} {dt:8.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    g0 = jnp.asarray(rng.integers(0, 256, (PAIRS, H, W)).astype(np.float32))
    g1 = jnp.asarray(rng.integers(0, 256, (PAIRS, H, W)).astype(np.float32))
    print(f"devices: {jax.devices()}  pairs={PAIRS} iters={ITERS}")

    full = jax.vmap(lambda a, b: F.farneback_flow(a, b, **REF))

    for label, prec in [
        ("HIGH (current)", jax.lax.Precision.HIGH),
        ("DEFAULT (1-pass bf16)", jax.lax.Precision.DEFAULT),
    ]:
        orig = F._toeplitz_correlate
        F._toeplitz_correlate = patched_toeplitz(prec)
        # farneback_flow is jitted: its executable cache would otherwise
        # serve the previous precision's program for identical shapes
        F.farneback_flow.clear_cache()
        try:
            print(f"== box-blur precision: {label}")
            flow_err_vs_cv2(label, np.random.default_rng(7))
            timed("full farneback_flow 540p", full, g0, g1)
        finally:
            F._toeplitz_correlate = orig
            F.farneback_flow.clear_cache()


if __name__ == "__main__":
    main()
