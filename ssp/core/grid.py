"""Cell-grid ops: space↔depth, 65-channel labels, heatmap flattening.

NHWC equivalents of the reference's ``utils/d2s.py`` (SpaceToDepth /
DepthToSpace), ``labels2Dto3D`` (``utils/utils.py:408-440``) and
``flattenDetection`` (``utils/utils.py:515-560``).  Pure
reshape/transpose + softmax — XLA fuses these into the surrounding
graph; no kernels needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

CELL = 8  # SuperPoint cell size (8×8 pixels per detector cell)


def space_to_depth(x: jnp.ndarray, block: int = CELL) -> jnp.ndarray:
    """[B, H, W, C] → [B, H/b, W/b, C·b²].

    Channel ordering matches PyTorch's pixel_unshuffle / the reference's
    ``SpaceToDepth`` (``utils/d2s.py:26-44``): output channel index is
    ``c·b² + dy·b + dx`` — i.e. block-position-major within each input
    channel.  ``labels_to_cells``/``flatten_detection`` round-trip relies
    on this ordering.
    """
    B, H, W, C = x.shape
    x = x.reshape(B, H // block, block, W // block, block, C)
    # → [B, H/b, W/b, C, b(dy), b(dx)]
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(B, H // block, W // block, C * block * block)


def depth_to_space(x: jnp.ndarray, block: int = CELL) -> jnp.ndarray:
    """[B, Hc, Wc, C·b²] → [B, Hc·b, Wc·b, C] (inverse of space_to_depth)."""
    B, Hc, Wc, Cb = x.shape
    C = Cb // (block * block)
    x = x.reshape(B, Hc, Wc, C, block, block)
    x = x.transpose(0, 1, 4, 3, 2, 5)  # → [B, Hc, b(dy), C, Wc, b(dx)]
    x = x.transpose(0, 1, 2, 4, 5, 3)  # → [B, Hc, b, Wc, b, C]
    return x.reshape(B, Hc * block, Wc * block, C)


def labels_to_cells(
    labels_2d: jnp.ndarray, block: int = CELL, add_dustbin: bool = True
) -> jnp.ndarray:
    """Binary keypoint map [B, H, W, 1] → cell labels [B, Hc, Wc, 64(+1)].

    With the dustbin: cells containing no keypoint get dustbin=1, and the
    per-cell distribution is normalized to sum to one (n keypoints in a
    cell → each gets 1/n).  Reference ``labels2Dto3D``
    (``utils/utils.py:408-440``).
    """
    cells = space_to_depth(labels_2d, block)  # [B, Hc, Wc, 64]
    if add_dustbin:
        n = jnp.sum(cells, axis=-1, keepdims=True)
        dustbin = jnp.where(n >= 1.0, 0.0, 1.0)
        cells = jnp.concatenate([cells, dustbin], axis=-1)
        cells = cells / jnp.sum(cells, axis=-1, keepdims=True)
    return cells


def flatten_detection(semi: jnp.ndarray) -> jnp.ndarray:
    """Detector logits [B, Hc, Wc, 65] → full-res heatmap [B, H, W, 1].

    softmax over the 65 channels, drop the dustbin, depth-to-space.
    Reference ``flattenDetection`` (``utils/utils.py:515-560``).

    A 64-channel no-dustbin head is passed through depth-to-space raw —
    no softmax — matching the reference's ``flatten_64to1``
    (``Train_model_heatmap_all.py:678-690``, dispatched on channel count
    at ``Val_model_heatmap.py:135-139``).
    """
    if semi.shape[-1] == CELL * CELL:  # 64-ch no-dustbin head
        return depth_to_space(semi, CELL)
    dense = jax.nn.softmax(semi, axis=-1)
    nodust = dense[..., :-1]
    return depth_to_space(nodust, CELL)
