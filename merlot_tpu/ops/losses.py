"""Loss primitives.

cross_entropy_with_logits mirrors the reference's one-hot formulation
(reference: utils/model_utils.py:313-332): ``-sum(one_hot * log_softmax)``
with optional per-class weights. One-hot matmul is MXU-friendly and avoids
dynamic gathers on TPU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy_with_logits(logits: jnp.ndarray, labels: jnp.ndarray,
                              cls_level_weights: Optional[jnp.ndarray] = None
                              ) -> jnp.ndarray:
    """Per-example CE. logits [..., C], int labels [...] -> loss [...]."""
    num_classes = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    if cls_level_weights is not None:
        one_hot = one_hot * cls_level_weights
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(log_probs * one_hot, axis=-1)
