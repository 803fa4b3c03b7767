"""Inference agent — mirror of the reference's ``Val_model_heatmap``.

The reference class (``Val_model_heatmap.py``) wraps a loaded model and
exposes ``run`` (heatmap), ``heatmap_to_pts`` (NMS keypoints) and
``desc_to_sparseDesc`` (descriptors at keypoints) for the export CLIs.
Here those stages are one jitted device call with fixed-K outputs; the
class keeps the same three-step surface for API parity.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssp.core.grid import flatten_detection
from ssp.models import build_model
from ssp.postprocess.points import (
    extract_keypoints,
    sample_descriptors,
    soft_argmax_refine,
)
from ssp.registry import register
from ssp.train.checkpoint import load_checkpoint
from ssp.train.state import create_train_state


@register("agent", "Val_model_heatmap")
class ValAgent:
    def __init__(self, config: Dict[str, Any], input_hw=(240, 320), **_unused):
        m = config["model"] if "model" in config else config
        self.conf_thresh = float(m.get("detection_threshold", 0.015))
        self.nms_dist = int(m.get("nms", 4))
        self.top_k = int(m.get("top_k", 1000))
        sub = m.get("subpixel", {}) or {}
        self.subpixel = bool(sub.get("enable", False))
        self.patch_size = int(sub.get("patch_size", 5))
        self.fast_inference = bool(m.get("fast_inference", True))
        self.model = build_model(m["name"], **dict(m.get("params") or {}))
        self.input_hw = tuple(input_hw)
        self._variables: Optional[Dict[str, Any]] = None
        self._jitted = None
        pretrained = config.get("pretrained") or m.get("pretrained")
        if pretrained:
            self.load_model(pretrained)

    def load_model(self, path) -> None:
        state = create_train_state(self.model, jax.random.key(0), (1, *self.input_hw, 1))
        state = load_checkpoint(path, state, mode="weights")
        self._variables = {"params": state.params, "batch_stats": state.batch_stats}
        self._jitted = None  # the cached jit closes over the old weights

    loadModel = load_model  # reference-spelling alias

    def init_random(self) -> None:
        v = self.model.init(
            jax.random.key(0), jnp.zeros((1, *self.input_hw, 1)), train=False
        )
        self._variables = {"params": v["params"], "batch_stats": v.get("batch_stats", {})}
        self._jitted = None

    def _fn(self):
        if self._jitted is None:
            assert self._variables is not None, "load_model first"
            variables = self._variables
            from ssp.models.fast_infer import best_apply_fn

            apply_fn = best_apply_fn(self.model, variables, input_hw=tuple(self.input_hw),
                                     enable=self.fast_inference)

            def run(image):
                out = apply_fn(variables, image[None, ..., None], train=False)
                heat = flatten_detection(out["semi"])[0, ..., 0]
                pts, valid = extract_keypoints(
                    heat, k=self.top_k, conf_thresh=self.conf_thresh,
                    nms_radius=self.nms_dist,
                )
                if self.subpixel:
                    pts = soft_argmax_refine(heat, pts, self.patch_size)
                desc = sample_descriptors(out["desc"][0], pts)
                return heat, pts, valid, desc

            self._jitted = jax.jit(run)
        return self._jitted

    # -- reference-shaped API -----------------------------------------
    def run(self, image: np.ndarray) -> np.ndarray:
        """image [H, W] → heatmap [H, W]; caches the full result so the
        pts/desc accessors don't recompute."""
        heat, pts, valid, desc = jax.device_get(self._fn()(jnp.asarray(image)))
        v = np.asarray(valid)
        self._last = {
            "heatmap": np.asarray(heat),
            "pts": np.asarray(pts)[v],
            "desc": np.asarray(desc)[v],
        }
        return self._last["heatmap"]

    def heatmap_to_pts(self) -> np.ndarray:
        return self._last["pts"]

    def desc_to_sparse_desc(self) -> np.ndarray:
        return self._last["desc"]

    desc_to_sparseDesc = desc_to_sparse_desc  # reference-spelling alias
