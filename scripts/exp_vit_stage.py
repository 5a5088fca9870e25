"""ViT stage diagnostic: where do the 48-image forward's milliseconds go?

Times ablated ViT-B/16 variants (random weights — timing only) on the real
TPU with scan-chained dispatch.  The deltas between variants attribute time
to the attention dots+softmax, the MLP, and the dense projections, since
per-op device profiles are unavailable through the axon relay.

Variants:
  full        — the shipped ViT (bf16, fused stats reduce)
  no_softmax  — softmax replaced by *1/197 scaling (keeps both einsums and
                layouts; isolates softmax + fp32 cast cost)
  no_attn     — attention block replaced by identity (patch embed + MLPs +
                LNs only)
  no_mlp      — MLP replaced by identity (attention path only)
  softmax_bf16— attention probs computed in bf16 end-to-end (numerics probe
                candidate: worth it only if it buys real time)

Usage: python scripts/exp_vit_stage.py [batch] [iters]
"""
from __future__ import annotations

import sys
import time
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from relaxtpu.models.initutil import fast_init

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 48
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8


class AblatedBlock(nn.Module):
    dim: int
    num_heads: int
    mode: str
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        ln = lambda name: nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=name)  # noqa: E731
        if self.mode != "no_attn":
            h = ln("norm1")(x)
            qkv = nn.Dense(self.dim * 3, use_bias=True, dtype=self.dtype, name="qkv")(h)
            q = qkv[..., : self.dim].reshape(b, n, self.num_heads, head_dim)
            k = qkv[..., self.dim : 2 * self.dim].reshape(b, n, self.num_heads, head_dim)
            v = qkv[..., 2 * self.dim :].reshape(b, n, self.num_heads, head_dim)
            if self.mode == "softmax_bf16":
                attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (head_dim ** -0.5)
                attn = jax.nn.softmax(attn, axis=-1)
            else:
                attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                  preferred_element_type=jnp.float32) * (head_dim ** -0.5)
                if self.mode == "no_softmax":
                    attn = (attn * (1.0 / n)).astype(self.dtype)
                else:
                    attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            y = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                           preferred_element_type=jnp.float32).astype(self.dtype)
            y = y.reshape(b, n, c)
            x = x + nn.Dense(self.dim, dtype=self.dtype, name="proj")(y)
        if self.mode != "no_mlp":
            h = ln("norm2")(x)
            h = nn.Dense(self.dim * 4, dtype=self.dtype, name="mlp_fc1")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
            x = x + h
        return x


class AblatedViT(nn.Module):
    mode: str
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        y = nn.Conv(self.dim, (16, 16), (16, 16), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        y = y.reshape(b, -1, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        pe = self.param("pos_embed", nn.initializers.zeros, (1, 197, self.dim))
        y = jnp.concatenate([jnp.tile(cls.astype(self.dtype), (b, 1, 1)), y], 1)
        y = y + pe.astype(self.dtype)
        for i in range(self.depth):
            y = AblatedBlock(self.dim, self.num_heads, self.mode,
                             dtype=self.dtype, name=f"block{i}")(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(y)
        t = y[:, 1:].astype(jnp.float32)
        return jnp.concatenate(
            [jnp.mean(t, 1), jnp.max(t, 1), jnp.std(t, 1)], -1
        )


def timed(name, model, vars_, x):
    @jax.jit
    def chained(v, xx):
        def body(c, _):
            out = model.apply(v, xx + c.astype(xx.dtype) * 1e-8)
            return c + out.ravel()[0].astype(jnp.float32) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return c

    float(np.asarray(chained(vars_, x)))
    t0 = time.perf_counter()
    float(np.asarray(chained(vars_, x)))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:16s} {dt:8.2f} ms/call", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    x = jnp.asarray(
        np.random.default_rng(0).random((BATCH, 224, 224, 3), np.float32)
    ).astype(jnp.bfloat16)
    for mode in ("full", "no_softmax", "no_attn", "no_mlp", "softmax_bf16"):
        model = AblatedViT(mode=mode)
        vars_ = fast_init(model, jnp.zeros((1, 224, 224, 3)))
        timed(mode, model, vars_, x)


if __name__ == "__main__":
    main()
