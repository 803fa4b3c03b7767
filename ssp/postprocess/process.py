"""Batched training-time post-processing — reference ``model_utils.py``.

``SuperPointNet_process`` in the reference (``models/model_utils.py``)
provides tensor-batched NMS, soft-argmax offsets, and fixed-N feature
extraction for training-time use.  Here it is a thin class over the
fixed-shape jitted primitives, keeping the reference method names.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ssp.postprocess.nms import simple_nms
from ssp.postprocess.points import (
    extract_keypoints,
    sample_descriptors,
    soft_argmax_refine,
)


class SuperPointProcess:
    """Reference-shaped API: ``heatmap_to_nms``, ``pred_soft_argmax``,
    ``batch_extract_features`` (``models/model_utils.py:24-207``)."""

    def __init__(
        self,
        out_num_points: int = 500,
        patch_size: int = 5,
        nms_dist: int = 4,
        conf_thresh: float = 0.015,
    ):
        self.out_num_points = out_num_points
        self.patch_size = patch_size
        self.nms_dist = nms_dist
        self.conf_thresh = conf_thresh

    def heatmap_to_nms(self, heatmap: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W] → NMS'd heatmap (batched)."""
        return simple_nms(heatmap, self.nms_dist)

    def pred_soft_argmax(
        self, heatmap_nms: jnp.ndarray, heatmap: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        """Subpixel offsets at the NMS peaks: returns fixed-K refined
        points per batch element."""

        def one(nms_map, heat):
            pts, valid = extract_keypoints(
                nms_map, k=self.out_num_points, conf_thresh=self.conf_thresh,
                nms_radius=0, nms_iterations=1,
            )
            refined = soft_argmax_refine(heat, pts, self.patch_size)
            return pts, refined, valid

        pts, refined, valid = jax.vmap(one)(heatmap_nms, heatmap)
        return {"pts": pts, "pred": refined[..., :2] - pts[..., :2], "valid": valid}

    def batch_extract_features(
        self, desc: jnp.ndarray, heatmap_nms: jnp.ndarray, residual: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        """Fixed-N points + offsets + descriptors per batch element
        (the reference pads/crops to ``out_num_points``,
        ``model_utils.py:173-207``; ours is fixed-K by construction)."""

        def one(d, nms_map, res):
            pts, valid = extract_keypoints(
                nms_map, k=self.out_num_points, conf_thresh=self.conf_thresh,
                nms_radius=0, nms_iterations=1,
            )
            # the reference samples descriptors at the subpixel-refined
            # positions pts_int + res (``model_utils.py:190-194``); res
            # rows align with pts because pred_soft_argmax extracts with
            # the identical parameters from the same NMS maps
            refined = jnp.concatenate([pts[..., :2] + res, pts[..., 2:]], axis=-1)
            descs = sample_descriptors(d, refined)
            return pts, descs, valid

        pts, descs, valid = jax.vmap(one)(desc, heatmap_nms, residual)
        return {
            "pts_int": pts[..., :2],
            "pts_offset": residual,
            "pts_desc": descs,
            "valid": valid,
        }
