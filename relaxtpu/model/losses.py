"""MAE + pairwise rank loss (ref ``src/model_regression.py:61-89``)."""

from __future__ import annotations

import jax.numpy as jnp


def mae_and_rank_loss(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    l1_w: float = 0.6,
    rank_w: float = 1.0,
    margin: float = 0.0,
    use_margin: bool = False,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """loss = l1_w * MAE + rank_w * sum(relu(true_diff - sign(true_diff) *
    pred_diff)) / (n (n-1)), all pairs in the batch.

    ``mask`` (optional, (n,) {0,1}) supports padded batches under jit: masked
    rows contribute to neither the MAE mean nor the pair sum, and n counts
    only real rows — exact equivalence with the reference's dynamic batch.
    """
    y_pred = y_pred.reshape(-1)
    y_true = y_true.reshape(-1)
    if mask is None:
        n = y_pred.shape[0]
        l_mae = jnp.mean(jnp.abs(y_pred - y_true)) * l1_w
        pair_mask = 1.0
        # guard n=1 (the reference divides by zero there; latent bug)
        denom = max(n * (n - 1), 1)
    else:
        mask = mask.astype(y_pred.dtype)
        n = jnp.sum(mask)
        l_mae = jnp.sum(jnp.abs(y_pred - y_true) * mask) / jnp.maximum(n, 1) * l1_w
        pair_mask = mask[:, None] * mask[None, :]
        denom = jnp.maximum(n * (n - 1), 1)

    pred_diff = y_pred[:, None] - y_pred[None, :]
    true_diff = y_true[:, None] - y_true[None, :]
    signs = jnp.sign(true_diff)
    if use_margin and margin > 0:
        true_diff = jnp.maximum(jnp.abs(true_diff) - margin, 0.0)
        signs = jnp.sign(true_diff)
    l_rank = jnp.sum(jnp.maximum(true_diff - signs * pred_diff, 0.0) * pair_mask) / denom
    return l_mae + rank_w * l_rank
