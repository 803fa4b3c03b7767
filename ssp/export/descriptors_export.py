"""HPatches keypoint/descriptor/match export (stage 4a).

Reference pipeline (``export.py:66-189``): per image pair, run the
model, NMS + threshold + top-k keypoints, optional soft-argmax subpixel
refinement, sample descriptors at keypoints, two-way-match the pair,
and write one npz per pair with keys
``image, prob, desc, warped_image, warped_prob, warped_desc,
homography, matches`` (consumed by ``evaluation.py``).

TPU-native: detection + description for a pair is one jitted call
(fixed top-k + validity masks); matching and npz writing stay host-side
(eval protocol).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Callable, Dict, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ssp.core.grid import flatten_detection
from ssp.postprocess.points import (
    extract_keypoints,
    sample_descriptors,
    sample_descriptors_mxu,
    soft_argmax_refine,
)
from ssp.postprocess.tracker import PointTracker

log = logging.getLogger(__name__)


def make_detect_describe_var_fn(
    apply_fn: Callable,
    *,
    top_k: int = 1000,
    conf_thresh: float = 0.015,
    nms_radius: int = 4,
    subpixel: bool = True,
    patch_size: int = 5,
    nms_iterations: int = 3,
    topk_method: str = "exact",
    desc_sampler: str = "gather",
):
    """(variables, image [H, W]) → (pts, valid, desc), jitted.

    Weights are a traced argument, so one compilation serves every
    checkpoint of a sweep (``ssp/cli/export_eval.py``).

    ``topk_method``: "exact" (``lax.top_k``) or "approx"
    (``lax.approx_max_k`` recall 0.95 — the TPU-optimized variant);
    ``desc_sampler``: "gather" (``sample_descriptors``) or "mxu"
    (``sample_descriptors_mxu``).  Metric neutrality of the fast
    variants on the fixed evaluation corpus is established by
    ``scripts/ab_postprocess.py`` + ``tests/test_ab_postprocess.py``."""

    def fn(variables: Dict[str, Any], image: jnp.ndarray):
        from ssp.postprocess.nms import batched_nms

        out = apply_fn(variables, image[None, ..., None], train=False)
        heat = flatten_detection(out["semi"])[0, ..., 0]
        # border removal is fused into the NMS kernel on accelerators
        heat_nms = batched_nms(heat[None], nms_radius, iterations=nms_iterations,
                               border=4)[0]
        if topk_method == "approx":
            H, W = heat_nms.shape
            scores, idx = jax.lax.approx_max_k(
                heat_nms.reshape(-1), top_k, recall_target=0.95
            )
            pts = jnp.stack(
                [(idx % W).astype(jnp.float32),
                 (idx // W).astype(jnp.float32), scores],
                axis=-1,
            )
            valid = scores >= conf_thresh
        else:
            pts, valid = extract_keypoints(
                heat_nms, k=top_k, conf_thresh=conf_thresh, nms_radius=0,
                border=0, nms_iterations=1,
            )
        if subpixel:
            pts = soft_argmax_refine(heat, pts, patch_size)
        sampler = (
            sample_descriptors_mxu if desc_sampler == "mxu" else sample_descriptors
        )
        desc = sampler(out["desc"][0], pts)
        return pts, valid, desc

    return jax.jit(fn)


def make_detect_describe_fn(
    apply_fn: Callable,
    variables: Dict[str, Any],
    **kw,
):
    """(image [H, W]) → (pts [k, 3], valid [k], desc [k, D]), jitted."""
    var_fn = make_detect_describe_var_fn(apply_fn, **kw)

    def fn(image: jnp.ndarray):
        return var_fn(variables, image)

    return fn


def run_descriptor_export(
    dd_fn,
    pairs: Iterable[Dict[str, Any]],
    out_dir: Path,
    *,
    nn_thresh: float = 1.0,
) -> int:
    """Export every pair dict (from ``PatchesDataset``) to
    ``<out_dir>/<idx>.npz``.  File naming is the reference's sequential
    integer scheme (``evaluation.py:124`` sorts numerically)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    count = 0
    for idx, pair in enumerate(pairs):
        out_file = out_dir / f"{idx}.npz"
        if out_file.exists():
            # resume-by-skip: count only new writes (same return
            # contract as run_ha_export)
            continue
        p1, v1, d1 = jax.device_get(dd_fn(jnp.asarray(pair["image"])))
        p2, v2, d2 = jax.device_get(dd_fn(jnp.asarray(pair["warped_image"])))
        pts1, desc1 = np.asarray(p1)[np.asarray(v1)], np.asarray(d1)[np.asarray(v1)]
        pts2, desc2 = np.asarray(p2)[np.asarray(v2)], np.asarray(d2)[np.asarray(v2)]

        tracker = PointTracker(max_length=2, nn_thresh=nn_thresh)
        tracker.update(pts1.T, desc1.T)
        tracker.update(pts2.T, desc2.T)
        matches = tracker.get_matches()  # [4, L]

        np.savez_compressed(
            out_file,
            image=pair["image"],
            warped_image=pair["warped_image"],
            prob=pts1,
            warped_prob=pts2,
            desc=desc1,
            warped_desc=desc2,
            homography=pair["homography"],
            matches=matches.T if matches is not None else np.zeros((0, 4)),
        )
        count += 1
    return count
