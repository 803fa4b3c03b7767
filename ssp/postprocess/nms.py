"""Grid non-maximum suppression on TPU.

The reference NMS (``utils/utils.py:653-712``, MagicLeap's ``nms_fast``)
is an inherently sequential greedy sweep over confidence-sorted points —
hostile to any SIMD hardware.  We use iterated local-max suppression
instead: a point survives if it is the maximum of its (2r+1)² window, or
becomes one after all suppressed neighbours of stronger survivors are
zeroed.  Two or three rounds reproduce greedy box-NMS semantics for
everything but pathological score ties; the reference itself ships this
relaxation as its ``box_nms`` alternative (``utils/utils.py:612-650``).
Acceptance is metric parity (repeatability/matching score), not
bit-parity — see SURVEY.md §7 "Hard parts".

Implementation: ``lax.reduce_window`` max-pools, fully fused by XLA; no
sorting, no data-dependent shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _maxpool_same(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Window max over (2r+1)² with SAME padding; x is [..., H, W]."""
    k = 2 * radius + 1
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1,) * (x.ndim - 2) + (k, k),
        window_strides=(1,) * x.ndim,
        padding="SAME",
    )


def batched_nms(
    scores: jnp.ndarray, radius: int, iterations: int = 3, border: int = 0
) -> jnp.ndarray:
    """[B, H, W] NMS choosing the fused Pallas kernel on accelerators
    and the XLA reduce_window chain on CPU.  Use this (plus
    ``extract_keypoints(..., nms_radius=0)``) in batched pipelines —
    the Pallas kernel handles the batch natively but not under vmap.

    ``border > 0`` also zeroes detections within ``border`` px of the
    image edge (the reference's ``border_remove``); fused into the
    Pallas kernel on accelerators, a masked pass on the CPU path."""
    if radius > 0 and jax.default_backend() == "tpu":
        # == "tpu", not != "cpu": the kernel is TPU-Mosaic-only — on a
        # GPU backend the XLA path below is the fallback, not a crash
        from ssp.kernels.nms_pallas import nms_pallas

        return nms_pallas(scores, radius, iterations, border=border)
    out = simple_nms(scores, radius, iterations)
    if border:
        out = zero_border(out, border)
    return out


def zero_border(scores: jnp.ndarray, border: int) -> jnp.ndarray:
    """Zero detections within ``border`` px of the [..., H, W] edges —
    the reference's ``border_remove`` (``model_wrap.py:266-293``).
    Shared by the CPU NMS path and ``extract_keypoints``; the Pallas
    kernel fuses the same mask in-kernel."""
    H, W = scores.shape[-2:]
    ys = (jnp.arange(H) >= border) & (jnp.arange(H) < H - border)
    xs = (jnp.arange(W) >= border) & (jnp.arange(W) < W - border)
    return jnp.where(ys[:, None] & xs[None, :], scores, jnp.zeros_like(scores))


@partial(jax.jit, static_argnames=("radius", "iterations"))
def simple_nms(scores: jnp.ndarray, radius: int, iterations: int = 3) -> jnp.ndarray:
    """Iterative local-max NMS.

    scores: [..., H, W] non-negative heatmap.  Returns the heatmap with
    non-maxima zeroed (same contract as the reference's ``box_nms``
    output map).
    """
    zeros = jnp.zeros_like(scores)
    max_mask = scores == _maxpool_same(scores, radius)
    for _ in range(iterations - 1):
        supp_mask = _maxpool_same(max_mask.astype(scores.dtype), radius) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == _maxpool_same(supp_scores, radius)
        max_mask = max_mask | (new_max_mask & ~supp_mask)
    return jnp.where(max_mask, scores, zeros)
