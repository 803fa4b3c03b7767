"""Dense descriptor hinge loss over all cell pairs.

Spec: reference ``descriptor_loss`` (``utils/utils.py:779-893``): build
the [B, Hc, Wc, Hc, Wc] correspondence mask by warping every cell-centre
of image 1 into image 2 and thresholding the pixel distance to every
cell-centre at ``descriptor_dist``; hinge on the all-pairs descriptor
dot products:

  L = Σ valid · (λ_d · mask · max(0, 1 − d·d′) + (1−mask) · max(0, d·d′ − 0.2))
      / (B · (Σ valid + 1) · Hc · Wc)

TPU notes: the all-pairs dot product is a single [B·Hc·Wc, D] ×
[D, B·Hc·Wc]-style einsum — pure MXU work; the mask build is a handful
of elementwise ops on a [B, Hc·Wc, 2] warp.  At 30×40 cells the pair
tensor is ~1.4 M floats per batch element — trivially resident.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ssp.core.homography import warp_points

CELL = 8


def descriptor_loss_dense(
    desc: jnp.ndarray,
    desc_warped: jnp.ndarray,
    H_pair: jnp.ndarray,
    valid_mask: jnp.ndarray,
    lambda_d: float = 250.0,
    descriptor_dist: float = 4.0,
    margin_pos: float = 1.0,
    margin_neg: float = 0.2,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """desc/desc_warped: [B, Hc, Wc, D]; H_pair: [B, 3, 3] normalized
    ([-1, 1]²) homographies mapping image 1 → image 2; valid_mask:
    [B, Hc, Wc] cell-level validity of the warped image.

    Returns (loss, corr_mask, pos_term, neg_term) like the reference
    (pos/neg already normalized, used by the multi-task loss).
    """
    B, Hc, Wc, D = desc.shape
    H_img, W_img = Hc * CELL, Wc * CELL

    # cell centres in pixel space, then to [-1, 1]² (x, y)
    cy, cx = jnp.meshgrid(jnp.arange(Hc), jnp.arange(Wc), indexing="ij")
    centres = jnp.stack([cx, cy], axis=-1).reshape(-1, 2) * CELL + CELL // 2
    centres_n = centres / jnp.array([W_img, H_img]) * 2.0 - 1.0

    warped_n = warp_points(centres_n, H_pair)  # [B, N, 2] (x, y)
    warped_pix = (warped_n + 1.0) / 2.0 * jnp.array([W_img, H_img])

    # pairwise distances: warp(centre_i) vs centre_j  →  [B, N, N]
    diff = warped_pix[:, :, None, :] - centres[None, None, :, :]
    dist = jnp.linalg.norm(diff, axis=-1)
    corr = (dist <= descriptor_dist).astype(jnp.float32)  # [B, N(i), N(j)]

    d1 = desc.reshape(B, -1, D)
    d2 = desc_warped.reshape(B, -1, D)
    dot = jnp.einsum("bid,bjd->bij", d1, d2)  # [B, N, N] — MXU

    pos = jnp.maximum(margin_pos - dot, 0.0)
    neg = jnp.maximum(dot - margin_neg, 0.0)

    # valid over the *warped* image cells (j index)
    vm = valid_mask.reshape(B, 1, -1)
    weighted = (lambda_d * corr * pos + (1.0 - corr) * neg) * vm
    norm = B * (jnp.sum(valid_mask) + 1.0) * Hc * Wc
    pos_term = jnp.sum(lambda_d * corr * pos * vm) / norm
    neg_term = jnp.sum((1.0 - corr) * neg * vm) / norm
    loss = jnp.sum(weighted) / norm
    return loss, corr, pos_term, neg_term
