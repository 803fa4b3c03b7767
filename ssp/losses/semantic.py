"""Semantic segmentation loss: cross-entropy with an ignore class.

Spec: reference ``Train_model_heatmap_all.sem_loss``
(``Train_model_heatmap_all.py:181-193``) — ``nn.CrossEntropyLoss``
with ``ignore_index=133``, i.e. mean NLL over non-ignored pixels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def semantic_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_class: int = 133
) -> jnp.ndarray:
    """logits: [B, H, W, C]; labels: int [B, H, W] in [0, C] (C = ignore)."""
    valid = (labels != ignore_class).astype(jnp.float32)
    safe = jnp.where(labels == ignore_class, 0, labels)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / (jnp.sum(valid) + 1e-9)
