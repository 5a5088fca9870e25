"""Fused single-tile attention kernel (ops/attention.py) vs the einsum path.

Interpret mode on CPU validates the kernel LOGIC (masking, softmax,
layout plumbing); compiled-mode agreement on the real chip is asserted by
``scripts/backbone_roofline.py --section attn`` and the bench's
production-numerics key.  The einsum formulation in models/vit.py is the
reference here — it is itself pinned against the torch oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relaxtpu.ops.attention import fused_mha


def einsum_mha(q, k, v, scale):
    """The models/vit.py formulation, extracted verbatim."""
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@pytest.mark.parametrize("b,n,h,d", [(2, 197, 12, 64), (1, 17, 4, 32),
                                     (3, 128, 2, 64)])
def test_fused_matches_einsum_f32(rng, b, n, h, d):
    q, k, v = (jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
               for _ in range(3))
    scale = d ** -0.5
    ref = np.asarray(einsum_mha(q, k, v, scale))
    got = np.asarray(fused_mha(q, k, v, scale=scale, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_per_head_grid_matches_batch_grid(rng):
    """The (B, H) per-head grid variant computes identically to the
    batch-grid default (both measured on chip; batch-grid ships)."""
    b, n, h, d = 2, 197, 4, 64
    q, k, v = (jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
               for _ in range(3))
    scale = d ** -0.5
    base = np.asarray(fused_mha(q, k, v, scale=scale, interpret=True))
    got = np.asarray(fused_mha(q, k, v, scale=scale, interpret=True,
                               per_head_grid=True))
    np.testing.assert_array_equal(got, base)


def test_fused_matches_einsum_bf16(rng):
    b, n, h, d = 2, 197, 12, 64
    q, k, v = (jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.bfloat16)
               for _ in range(3))
    scale = d ** -0.5
    ref = np.asarray(einsum_mha(q, k, v, scale), np.float32)
    got = np.asarray(fused_mha(q, k, v, scale=scale, interpret=True), np.float32)
    # identical op order (f32 scores -> f32 softmax -> dtype cast -> f32-acc
    # A.V); only the rounding points differ
    np.testing.assert_allclose(got, ref, atol=2e-2)
    cos = np.dot(ref.ravel(), got.ravel()) / (
        np.linalg.norm(ref) * np.linalg.norm(got))
    assert cos > 0.99999


def test_padded_queries_do_not_leak(rng):
    """197 -> 256 padding: outputs for real tokens must be independent of
    anything in the pad region (padded keys are masked to -inf; padded
    queries are sliced off)."""
    b, n, h, d = 1, 197, 2, 64
    q, k, v = (jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
               for _ in range(3))
    scale = d ** -0.5
    base = np.asarray(fused_mha(q, k, v, scale=scale, interpret=True))
    # same real tokens, different tail content via a shorter/longer view:
    # recompute with an extra garbage token appended, then compare the
    # first n outputs of an (n+1)-token call restricted to the real keys —
    # instead, simplest independence check: scaling pad has no effect
    # because padding is constructed inside fused_mha; so assert against
    # the einsum reference, which has no pad region at all.
    ref = np.asarray(einsum_mha(q, k, v, scale))
    np.testing.assert_allclose(base, ref, atol=2e-4)
    assert base.shape == (b, n, h, d)


def test_vit_fused_flag_end_to_end(rng):
    """Depth-2 ViT with fused_attention=True matches the einsum ViT on the
    same weights (CPU interpret; non-224 input exercises pos-embed interp
    and a non-197 token count)."""
    from relaxtpu.models.initutil import fast_init
    from relaxtpu.models.vit import ViT

    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    base = ViT(depth=2)
    fused = ViT(depth=2, fused_attention=True)
    variables = fast_init(base, jnp.zeros((1, 64, 64, 3)),
                          key=jax.random.PRNGKey(1))
    ref = np.asarray(base.apply(variables, x, reduce="stats"))
    got = np.asarray(fused.apply(variables, x, reduce="stats"))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-4)

    # the visualization path (return_attention) must keep the einsum
    # formulation and still work under the fused flag
    attn = fused.apply(variables, x, reduce="last_attn")
    assert attn.shape == (2, 12, 17, 17)
