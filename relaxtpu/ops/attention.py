"""Fused single-tile multi-head attention for the ViT backbone (Pallas).

Why this exists: the backbone roofline (docs/DESIGN.md, r5) measured the
XLA attention halves at ~36% of the v5e MXU peak vs ~55% for the MLP
halves.  The gap is the score tensor: XLA materializes the
``(B, heads, N, N)`` logits in HBM around the softmax, pads N=197 to 256
lanes in BOTH einsums, and runs the softmax as a separate VPU pass over
~186M f32 elements.  For ViT-B/16 at 224px the whole per-head problem is
tiny — q/k/v are (197, 64) — so no online (flash) softmax is needed: ONE
(256, 256) score tile per (batch, head) fits comfortably in VMEM.  This
kernel computes scores, the masked softmax, and the attention.V
contraction without the score tile ever touching HBM.

Numerics mirror ``models/vit.py`` exactly: scores accumulated in f32
(``preferred_element_type``), softmax in f32, probabilities cast back to
the activation dtype for the A.V dot with f32 accumulation.  Padded key
columns are masked to -inf before the softmax; padded query rows attend
uniformly over real keys (q rows are zero-padded, so their logits are 0 —
finite) and are sliced off by the caller.

The reference's analog is torch SDPA inside its from-scratch ViT
(``/root/reference/src/extractor/visualise_vit_layer.py:81-105``); this is
a TPU-first replacement, not a translation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _mha_kernel(q_ref, kt_ref, v_ref, o_ref, *, n_valid: int, scale: float,
                heads: int):
    """One batch element: all ``heads`` single-tile attentions, unrolled.

    Blocks: q/v ``(1, heads, NP, D)``, kt ``(1, heads, D, NP)``,
    out ``(1, heads, NP, D)``.  The static unroll keeps each head's
    (NP, NP) score tile live only inside its own iteration, so VMEM stays
    small while the grid step stays large enough to amortize dispatch.
    """
    for h in range(heads):
        q = q_ref[0, h]  # (NP, D)
        kt = kt_ref[0, h]  # (D, NP)
        s = jax.lax.dot_general(
            q, kt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (NP, NP) f32, never leaves VMEM
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, -jnp.inf)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        o_ref[0, h] = jax.lax.dot_general(
            p.astype(q.dtype), v_ref[0, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret",
                                             "per_head_grid"))
def fused_mha(q: jax.Array, k: jax.Array, v: jax.Array, *, scale: float,
              interpret: bool = False, per_head_grid: bool = False) -> jax.Array:
    """Multi-head attention, (B, N, H, D) -> (B, N, H, D), fused on TPU.

    ``q``/``k``/``v`` are in the ViT's natural token-major layout (the
    head split of the qkv projection, no transposes) — the (B, H, ...)
    relayout this kernel needs is done here, where XLA fuses it into the
    projection's output epilogue instead of a standalone HBM round trip.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, h, d = q.shape
    npad = max(-(-n // 128) * 128, 128)
    pad = [(0, 0), (0, npad - n), (0, 0), (0, 0)]
    qt = jnp.swapaxes(jnp.pad(q, pad), 1, 2)  # (B, H, NP, D)
    vt = jnp.swapaxes(jnp.pad(v, pad), 1, 2)
    kt = jnp.transpose(jnp.pad(k, pad), (0, 2, 3, 1))  # (B, H, D, NP)

    # Grid iterations are independent — 'parallel' semantics lets Mosaic
    # pipeline the per-step DMA against the previous step's compute.
    if per_head_grid:
        grid = (b, h)
        hb = 1
        idx = lambda i, j: (i, j, 0, 0)  # noqa: E731
        sem = ("parallel", "parallel")
    else:
        grid = (b,)
        hb = h
        idx = lambda i: (i, 0, 0, 0)  # noqa: E731
        sem = ("parallel",)
    kern = functools.partial(_mha_kernel, n_valid=n, scale=scale, heads=hb)
    try:
        params = pltpu.CompilerParams(dimension_semantics=sem)
    except TypeError:  # interpret path / older plugin without the field
        params = None
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hb, npad, d), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, d, npad), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, npad, d), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hb, npad, d), idx,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, npad, d), q.dtype),
        interpret=interpret,
        **({"compiler_params": params} if params is not None else {}),
    )(qt, kt, vt)
    return jnp.swapaxes(out, 1, 2)[:, :n]  # (B, N, H, D)
