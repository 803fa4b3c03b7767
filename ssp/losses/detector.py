"""Detector loss: masked BCE over the 65-way softmax.

Spec: reference ``Train_model_heatmap_all.detector_loss``
(``Train_model_heatmap_all.py:155-179``) — elementwise binary
cross-entropy between softmax(semi) and the normalized 65-channel cell
labels, summed over channels, masked by the valid-region cell mask, and
normalized by the mask sum (+1e-5).  An ``l2`` variant (plain MSE mean)
exists for parity with the config's ``detector_loss.loss_type``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def detector_loss(
    semi: jnp.ndarray,
    cell_labels: jnp.ndarray,
    cell_mask: jnp.ndarray,
    loss_type: str = "softmax",
) -> jnp.ndarray:
    """semi/cell_labels: [B, Hc, Wc, 65]; cell_mask: [B, Hc, Wc]."""
    if loss_type == "l2":
        return jnp.mean((semi - cell_labels) ** 2)
    p = jax.nn.softmax(semi, axis=-1)
    p = jnp.clip(p, 1e-7, 1.0 - 1e-7)
    bce = -(cell_labels * jnp.log(p) + (1.0 - cell_labels) * jnp.log(1.0 - p))
    per_cell = jnp.sum(bce, axis=-1) * cell_mask
    return jnp.sum(per_cell) / (jnp.sum(cell_mask) + 1e-5)
