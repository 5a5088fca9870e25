"""Box-blur formulation experiment: shifted adds vs hybrid (vertical shifts +
horizontal Toeplitz matmul) vs full matmul, on the Farneback M planes.

Usage:
  JAX_PLATFORMS=cpu PYTHONPATH='' python scripts/exp_box.py check
  python scripts/exp_box.py time
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from relaxtpu.ops.flow import _box_blur


def _shift_sum(x, axis, count, stride, out_len):
    """sum_{k<count} x[..., k*stride : k*stride+out_len, ...] along ``axis``."""
    def sl(off):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(off, off + out_len)
        return x[tuple(idx)]

    return sum(sl(k * stride) for k in range(count))

H, W = 540, 960
PAIRS = 16
ITERS = 8
WIN = 15


def _box_toeplitz(n_out, winsize):
    """Replicate-border box-sum matrix, built on device from iota."""
    r = winsize // 2
    i = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_out), 0)
    s = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_out), 1)
    T = jnp.zeros((n_out, n_out), jnp.float32)
    for j in range(winsize):
        src = jnp.clip(i + j - r, 0, n_out - 1)
        T = T + (s == src).astype(jnp.float32)
    return T


def box_hybrid(m, winsize=WIN, precision=jax.lax.Precision.HIGHEST):
    """Vertical box as sublane shifted adds, horizontal as Toeplitz matmul."""
    r = winsize // 2
    c, h, w = m.shape
    x = jnp.pad(m, ((0, 0), (r, r), (0, 0)), mode="edge")
    if winsize % 3 == 0 and winsize >= 9:
        t = _shift_sum(x, 1, 3, 1, x.shape[1] - 2)
        x = _shift_sum(t, 1, winsize // 3, 3, h)
    else:
        x = _shift_sum(x, 1, winsize, 1, h)
    T = _box_toeplitz(w, winsize)  # (W, W): out = x @ T.T ; T[i,s] col-major
    return jnp.einsum("chw,xw->chx", x, T, precision=precision)


def box_matmul(m, winsize=WIN, precision=jax.lax.Precision.HIGHEST):
    c, h, w = m.shape
    Ty = _box_toeplitz(h, winsize)
    Tx = _box_toeplitz(w, winsize)
    v = jnp.einsum("yh,chw->cyw", Ty, m, precision=precision)
    return jnp.einsum("chw,xw->chx", v, Tx, precision=precision)


def main():
    rng = np.random.default_rng(0)
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    m1 = jnp.asarray(rng.normal(0, 100, (5, H, W)).astype(np.float32))

    if mode == "check":
        ref = np.asarray(_box_blur(m1, WIN))
        for name, fn in [
            ("hybrid", lambda x: box_hybrid(x)),
            ("matmul", lambda x: box_matmul(x)),
        ]:
            got = np.asarray(fn(m1))
            d = np.abs(got - ref)
            rel = d / (np.abs(ref) + 1e-3)
            print(f"{name:16s} maxabs={d.max():.3e} meanrel={rel.mean():.3e}")
        return

    ms = jnp.asarray(rng.normal(0, 100, (PAIRS, 5, H, W)).astype(np.float32))
    for name, fn in [
        ("current", lambda x: _box_blur(x, WIN)),
        ("hybrid-HIGHEST", lambda x: box_hybrid(x)),
        ("hybrid-HIGH", lambda x: box_hybrid(x, precision=jax.lax.Precision.HIGH)),
        ("hybrid-DEFAULT", lambda x: box_hybrid(x, precision=jax.lax.Precision.DEFAULT)),
        ("matmul-HIGH", lambda x: box_matmul(x, precision=jax.lax.Precision.HIGH)),
    ]:
        vf = jax.vmap(fn)

        @jax.jit
        def chained(p):
            def body(c, _):
                out = vf(p + c * 1e-30)
                return c + out.ravel()[0] * 1e-30, None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return c

        float(np.asarray(chained(ms)))
        t0 = time.perf_counter()
        float(np.asarray(chained(ms)))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{name:16s} {dt:7.2f} ms / {PAIRS}-pair batch")


if __name__ == "__main__":
    main()
