"""Subpixel residual loss.

Capability spec from ``utils/losses.py:145-217`` (``subpixel_loss`` /
``subpixel_loss_no_argmax``) and the training agent's residual
diagnostics (``Train_model_heatmap_all.py:623-675``): compare the
soft-argmax subpixel offsets predicted from the heatmap at keypoint
locations against the ground-truth fractional residuals kept by the
label pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp

from ssp.postprocess.points import soft_argmax_refine


def subpixel_residual_loss(
    heatmap: jnp.ndarray,
    points: jnp.ndarray,
    residuals: jnp.ndarray,
    valid: jnp.ndarray,
    patch_size: int = 5,
) -> jnp.ndarray:
    """heatmap [H, W]; points [K, 2] (x, y) integer label positions;
    residuals [K, 2] true fractional offsets; valid [K].

    Returns mean squared offset error over valid points.
    """
    pts3 = jnp.concatenate([points, jnp.zeros_like(points[:, :1])], axis=-1)
    refined = soft_argmax_refine(heatmap, pts3, patch_size)
    pred_offsets = refined[:, :2] - points
    err = jnp.sum((pred_offsets - residuals) ** 2, axis=-1)
    w = valid.astype(jnp.float32)
    return jnp.sum(err * w) / (jnp.sum(w) + 1e-6)
