"""DINO ViT-B/16, Flax linen, returning patch tokens (and fused statistics).

Mirrors the reference's from-scratch ViT
(``/root/reference/src/extractor/visualise_vit_layer.py:81-260``): embed 768,
depth 12, heads 12, mlp_ratio 4, qkv_bias=True, LayerNorm eps 1e-6,
pre-norm blocks, bicubic position-embedding interpolation for non-224 inputs
(ref :197-219), final norm, feature = patch tokens ``x[:, 1:]`` (ref :234-239).

TPU-first: batched; optional fused per-frame token statistics
(mean/max/std over the 196 tokens -> (B, 3*768)), which is exactly the "pool"
feature the aggregator computes (ref ``main_fragment_pool.py:114-136``), so
full token tensors never leave the program.  ViT inputs are NOT ImageNet
normalized — the reference transform is ToTensor only (ref :339-342).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def vit_preprocess(img_rgb_f01: jnp.ndarray) -> jnp.ndarray:
    """ViT input transform: identity on [0,1] RGB (ToTensor only, ref :339-342)."""
    return img_rgb_f01


class Attention(nn.Module):
    dim: int
    num_heads: int
    dtype: Any = jnp.float32
    fused: bool = False  # Pallas single-tile kernel (ops/attention.py)

    @nn.compact
    def __call__(self, x, need_weights: bool = True):
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=True, dtype=self.dtype, name="qkv")(x)
        # Contiguous last-axis splits (the qkv weight is [q; k; v] row blocks,
        # matching the DINO checkpoint layout) + head-dim einsums with NO
        # explicit (0, 2, 1, 3) transposes: each relayout of the (B, N, H, D)
        # activations was a real HBM round-trip per block; einsum lets XLA
        # fold the head split into the dot's dimension numbers.
        q = qkv[..., : self.dim].reshape(b, n, self.num_heads, head_dim)
        k = qkv[..., self.dim : 2 * self.dim].reshape(b, n, self.num_heads, head_dim)
        v = qkv[..., 2 * self.dim :].reshape(b, n, self.num_heads, head_dim)
        if self.fused and not need_weights:
            # Fused path: the (B, H, N, N) score tensor never reaches HBM.
            # Only for weight-free forwards — the visualization path needs
            # the attention matrix itself and keeps the einsum formulation.
            from relaxtpu.ops.attention import fused_mha

            y = fused_mha(q, k, v, scale=head_dim ** -0.5,
                          interpret=jax.default_backend() != "tpu")
            y = y.reshape(b, n, c)
            return nn.Dense(self.dim, dtype=self.dtype, name="proj")(y), None
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                          preferred_element_type=jnp.float32) * (head_dim ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        y = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                       preferred_element_type=jnp.float32).astype(self.dtype)
        y = y.reshape(b, n, c)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(y), attn


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int = 4
    dtype: Any = jnp.float32
    fused_attention: bool = False

    @nn.compact
    def __call__(self, x, return_attention: bool = False):
        ln = lambda name: nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=name)  # noqa: E731
        y, attn = Attention(
            self.dim, self.num_heads, dtype=self.dtype,
            fused=self.fused_attention, name="attn",
        )(ln("norm1")(x), need_weights=return_attention)
        if return_attention:
            return attn
        x = x + y
        h = ln("norm2")(x)
        h = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class ViT(nn.Module):
    """ViT backbone; defaults are DINO ViT-B/16."""

    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    dtype: Any = jnp.float32
    fused_attention: bool = False

    def interpolate_pos_embed(self, pos_embed, h_patches, w_patches):
        """Bicubic resize of the (1, N+1, D) position table (ref :197-219)."""
        n = pos_embed.shape[1] - 1
        if h_patches * w_patches == n and h_patches == w_patches:
            return pos_embed
        cls_pe = pos_embed[:, :1]
        patch_pe = pos_embed[:, 1:]
        side = int(math.sqrt(n))
        patch_pe = patch_pe.reshape(1, side, side, -1)
        patch_pe = jax.image.resize(
            patch_pe, (1, h_patches, w_patches, patch_pe.shape[-1]), method="bicubic"
        )
        patch_pe = patch_pe.reshape(1, h_patches * w_patches, -1)
        return jnp.concatenate([cls_pe, patch_pe], axis=1)

    @nn.compact
    def __call__(self, x, reduce: str | None = "stats"):
        """x: (B, H, W, 3) preprocessed. reduce='stats' -> (B, 3*D) fused
        mean/max/std over patch tokens; reduce=None -> (B, N, D) tokens."""
        b, h, w, _ = x.shape
        hp, wp = h // self.patch_size, w // self.patch_size
        y = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            (self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        y = y.reshape(b, hp * wp, self.embed_dim)

        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, self.embed_dim))
        pos_embed = self.param(
            "pos_embed", nn.initializers.zeros, (1, 197, self.embed_dim)
        )
        y = jnp.concatenate([jnp.tile(cls_token.astype(self.dtype), (b, 1, 1)), y], axis=1)
        y = y + self.interpolate_pos_embed(pos_embed.astype(self.dtype), hp, wp)

        for i in range(self.depth):
            blk = Block(self.embed_dim, self.num_heads, dtype=self.dtype,
                        fused_attention=self.fused_attention, name=f"block{i}")
            if reduce == "last_attn" and i == self.depth - 1:
                # attention of the last block (B, heads, N+1, N+1), for the
                # visualization path (ref get_last_selfattention :241-250)
                return blk(y, return_attention=True)
            y = blk(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(y)

        tokens = y[:, 1:]  # patch tokens only (ref :239)
        if reduce == "stats":
            t = tokens.astype(jnp.float32)
            mean = jnp.mean(t, axis=1)
            mx = jnp.max(t, axis=1)
            # np.std default ddof=0 (ref main_fragment_pool.py:128)
            std = jnp.std(t, axis=1)
            return jnp.concatenate([mean, mx, std], axis=-1)
        return tokens
