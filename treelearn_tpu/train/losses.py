"""Point-wise losses.

Parity: reference tree_learn/util/train.py:145-166 and the 50x semantic
multiplier applied in the model (tree_learn.py:9,121):
semantic = masked mean cross-entropy; offset = masked mean Euclidean distance;
both zero-grad-safe when the mask is empty.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

LOSS_MULTIPLIER_SEMANTIC = 50.0


def point_wise_loss(
    semantic_prediction_logits: jnp.ndarray,  # (N, 2) float
    offset_predictions: jnp.ndarray,          # (N, 3) float
    masks_sem: jnp.ndarray,                   # (N,) bool
    masks_off: jnp.ndarray,                   # (N,) bool
    semantic_labels: jnp.ndarray,             # (N,) int
    offset_labels: jnp.ndarray,               # (N, 3) float
    weights: Optional[jnp.ndarray] = None,
):
    logits = semantic_prediction_logits.astype(jnp.float32)
    offs = offset_predictions.astype(jnp.float32)

    labels = jnp.clip(semantic_labels, 0, logits.shape[1] - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    if weights is not None:
        ce = ce * weights
    msem = masks_sem.astype(jnp.float32)
    n_sem = msem.sum()
    semantic_loss = jnp.where(n_sem > 0, (ce * msem).sum() / jnp.maximum(n_sem, 1.0), 0.0)

    dist = jnp.sqrt(jnp.sum(jnp.square(offs - offset_labels.astype(jnp.float32)), axis=1) + 1e-12)
    moff = masks_off.astype(jnp.float32)
    n_off = moff.sum()
    offset_loss = jnp.where(n_off > 0, (dist * moff).sum() / jnp.maximum(n_off, 1.0), 0.0)

    return semantic_loss, offset_loss


def total_loss(semantic_loss, offset_loss):
    """Combined objective (reference tree_learn.py:107-126)."""
    loss_dict = {
        "semantic_loss": semantic_loss * LOSS_MULTIPLIER_SEMANTIC,
        "offset_loss": offset_loss,
    }
    return sum(loss_dict.values()), loss_dict
