"""Kendall multi-task uncertainty weighting.

Spec: reference ``MultiTaskLoss`` (``Train_model_heatmap_all.py:46-77``):
learnable log-variances η = [η_det, η_desc, η_sem] initialized to
[1.0, 2.0, 1.0];

  L = L_det·e^{-η₀} + η₀ + ½(L_pos + L_neg)·e^{-η₁} + ½η₁
      [+ L_sem·e^{-η₂} + η₂]

Unlike the reference (which forgets to checkpoint the ηs — TODO at
``Train_model_heatmap_all.py:57``), the ηs here live inside the train
state and are therefore saved/restored with every checkpoint.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def init_etas() -> jnp.ndarray:
    return jnp.array([1.0, 2.0, 1.0], dtype=jnp.float32)


def multi_task_loss(
    etas: jnp.ndarray,
    loss_det: jnp.ndarray,
    loss_desc_pos: jnp.ndarray,
    loss_desc_neg: jnp.ndarray,
    loss_sem: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    total = (
        loss_det * jnp.exp(-etas[0])
        + etas[0]
        + 0.5 * (loss_desc_pos + loss_desc_neg) * jnp.exp(-etas[1])
        + 0.5 * etas[1]
    )
    if loss_sem is not None:
        total = total + loss_sem * jnp.exp(-etas[2]) + etas[2]
    return total
