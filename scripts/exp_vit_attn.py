"""Time the ViT attention relayout variants on the real TPU in ONE process.

Variants (same params, same math — only the qkv split/contraction layout
differs):
  new — contiguous last-axis qkv splits + head-dim einsums, no explicit
        (0, 2, 1, 3) transposes (what `relaxtpu/models/vit.py` ships).
  old — reshape to (B, N, 3, H, D), split on axis 2, transpose each of
        q/k/v to (B, H, N, D), einsum over the head-major layout, transpose
        back (round-2 formulation).

Timing uses the on-device scan-chaining pattern (the axon relay makes
``block_until_ready`` a no-op; only a data fetch syncs).

Usage: python scripts/exp_vit_attn.py [batch] [iters]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import relaxtpu.models.vit as V
from relaxtpu.models.initutil import fast_init

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 48
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8

import flax.linen as nn

NEW_ATTENTION = V.Attention


class OldAttention(V.Attention):
    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=True, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32) * (head_dim ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        y = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                       preferred_element_type=jnp.float32).astype(self.dtype)
        y = y.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(y), attn


def timed(name, vit, vars_, x):
    @jax.jit
    def chained(v, xx):
        def body(carry, _):
            out = vit.apply(v, xx + carry.astype(xx.dtype) * 1e-8, reduce="stats")
            return carry + out.ravel()[0].astype(jnp.float32) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return c

    r = chained(vars_, x)
    v0 = float(np.asarray(r))
    t0 = time.perf_counter()
    float(np.asarray(chained(vars_, x)))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:34s} {dt:8.2f} ms/call  (out {v0:.6e})", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    vit = V.ViT(dtype=jnp.bfloat16)
    vars_ = fast_init(vit, jnp.zeros((1, 224, 224, 3)))
    x = jnp.asarray(
        np.random.default_rng(0).random((BATCH, 224, 224, 3), np.float32)
    ).astype(jnp.bfloat16)

    t_new = timed(f"new (no-relayout) {BATCH}img stats", vit, vars_, x)
    V.Attention = OldAttention
    t_old = timed(f"old (transpose)   {BATCH}img stats", vit, vars_, x)
    V.Attention = NEW_ATTENTION
    print(f"delta: old {t_old:.2f} -> new {t_new:.2f} ms "
          f"({(t_old - t_new) / t_old * 100:+.1f}% of old)", flush=True)


if __name__ == "__main__":
    main()
