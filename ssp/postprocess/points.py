"""Keypoint extraction, descriptor sampling, subpixel refinement.

Fixed-shape versions of the reference's ragged post-processing
(``utils/utils.py:581-609`` ``getPtsFromHeatmap``,
``models/model_wrap.py:295-313`` ``sample_desc_from_points``,
``models/model_wrap.py:212-248`` ``soft_argmax_points``).

Keypoints are always ``(pts [K, 3] = (x, y, score), valid [K])`` —
top-K over the NMS'd heatmap with a confidence-threshold validity mask.
Ragged truncation (e.g. npz export) happens host-side at write time.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ssp.postprocess.nms import simple_nms

BORDER_REMOVE = 4  # reference border margin (utils/utils.py:588)


@partial(jax.jit, static_argnames=("k", "nms_radius", "border", "nms_iterations"))
def extract_keypoints(
    heatmap: jnp.ndarray,
    k: int,
    conf_thresh: float = 0.015,
    nms_radius: int = 4,
    border: int = BORDER_REMOVE,
    nms_iterations: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """heatmap [H, W] → (pts [k, 3] (x, y, score) desc-sorted, valid [k]).

    Pipeline: NMS → border removal → top-k by confidence → threshold
    mask.  Matches ``getPtsFromHeatmap`` semantics with fixed shapes.
    """
    H, W = heatmap.shape
    # NB: stays the XLA implementation here because extract_keypoints is
    # routinely vmapped and the Pallas kernel's HBM input spec doesn't
    # support vmap-added batch blocking; batched callers pre-suppress
    # with ssp.postprocess.nms.batched_nms and pass nms_radius=0.
    nmsed = simple_nms(heatmap, nms_radius, nms_iterations)
    if border:
        from ssp.postprocess.nms import zero_border

        nmsed = zero_border(nmsed, border)
    scores, idx = jax.lax.top_k(nmsed.reshape(-1), k)
    pts = jnp.stack(
        [(idx % W).astype(jnp.float32), (idx // W).astype(jnp.float32), scores],
        axis=-1,
    )
    valid = scores >= conf_thresh
    return pts, valid


def sample_descriptors(
    coarse_desc: jnp.ndarray, pts: jnp.ndarray, cell: int = 8
) -> jnp.ndarray:
    """Bilinearly sample (and re-normalize) descriptors at keypoints.

    coarse_desc: [Hc, Wc, D]; pts: [K, ≥2] with (x, y) in full-res pixel
    units.  Mapping matches the reference's
    ``grid_sample(align_corners=True)`` after ``x → 2x/W - 1``
    (``models/model_wrap.py:295-313``): coarse coordinate
    ``cx = x · (Wc-1) / W``.
    """
    from ssp.core.warp import bilinear_sample

    Hc, Wc, _ = coarse_desc.shape
    H, W = Hc * cell, Wc * cell
    cx = pts[:, 0] * (Wc - 1) / W
    cy = pts[:, 1] * (Hc - 1) / H
    desc = bilinear_sample(coarse_desc, jnp.stack([cx, cy], axis=-1))
    return desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-12)


def sample_descriptors_mxu(
    coarse_desc: jnp.ndarray, pts: jnp.ndarray, cell: int = 8
) -> jnp.ndarray:
    """``sample_descriptors`` restructured for the MXU.

    Bilinear interpolation is a 4-gather per point; TPU gathers run at
    ~100 M samples/s, which makes descriptor sampling the single largest
    post-processing cost at export batch sizes.  The same interpolation
    is the matmul ``W @ desc`` with separable hat weights
    ``w[k, (i,j)] = hat(cy_k − i) · hat(cx_k − j)`` — dense [K, Hc·Wc]
    rows with four nonzeros.  At K = 1000, Hc·Wc = 4800 the matmul is
    2.5 GFLOP/image of pure MXU work and beats the gathers on v5e.

    Zero-padding edge behaviour matches ``bilinear_sample`` exactly
    (hat weights vanish outside the grid).  bf16 operands, fp32
    accumulation; same coordinate mapping as ``sample_descriptors``.
    """
    Hc, Wc, D = coarse_desc.shape
    H, W = Hc * cell, Wc * cell
    cx = pts[:, 0] * (Wc - 1) / W
    cy = pts[:, 1] * (Hc - 1) / H
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(cx[:, None] - jnp.arange(Wc)[None, :]))
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(cy[:, None] - jnp.arange(Hc)[None, :]))
    w = (wy[:, :, None] * wx[:, None, :]).reshape(pts.shape[0], Hc * Wc)
    desc = jnp.dot(
        w.astype(jnp.bfloat16),
        coarse_desc.reshape(Hc * Wc, D).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-12)


def _extract_patches(heatmap: jnp.ndarray, pts: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """Zero-padded ``patch_size``² windows centred at integer pts [K, 2]."""
    pad = patch_size // 2
    padded = jnp.pad(heatmap, pad)
    ix = pts[:, 0].astype(jnp.int32)
    iy = pts[:, 1].astype(jnp.int32)

    dy = jnp.arange(patch_size)
    dx = jnp.arange(patch_size)
    # gather windows: [K, p, p] — top-left of the window in padded coords
    # is exactly (iy, ix) because of the symmetric pad
    rows = iy[:, None, None] + dy[None, :, None]
    cols = ix[:, None, None] + dx[None, None, :]
    rows = jnp.clip(rows, 0, padded.shape[0] - 1)
    cols = jnp.clip(cols, 0, padded.shape[1] - 1)
    return padded[rows, cols]


def soft_argmax_refine(
    heatmap: jnp.ndarray, pts: jnp.ndarray, patch_size: int = 5
) -> jnp.ndarray:
    """Subpixel refinement via spatial soft-argmax over local patches.

    Reference chain (``models/model_wrap.py:212-248``): extract patch →
    normalize by patch sum → log → spatial softmax expectation (pixel
    units) → offset = expectation − patch//2.  Returns refined pts [K, 3]
    (score column preserved).
    """
    patches = _extract_patches(heatmap, pts, patch_size)  # [K, p, p]
    s = jnp.sum(patches, axis=(-2, -1), keepdims=True) + 1e-6
    patches = patches / s
    logp = jnp.log(jnp.where(patches <= 0.0, 1e-24, patches))
    w = jax.nn.softmax(logp.reshape(patches.shape[0], -1), axis=-1).reshape(patches.shape)
    grid = jnp.arange(patch_size, dtype=jnp.float32)
    ex = jnp.sum(w * grid[None, None, :], axis=(-2, -1))  # E[x]
    ey = jnp.sum(w * grid[None, :, None], axis=(-2, -1))  # E[y]
    offset = jnp.stack([ex, ey], axis=-1) - patch_size // 2
    refined = pts.at[:, :2].add(offset)
    return refined
