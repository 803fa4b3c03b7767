"""Subpixel-head training/validation agents.

The reference ships ``Train_model_subpixel.py`` / ``Val_model_subpixel.py``
for its ``SubpixelNet`` but both are dead code — the trainer imports a
module that no longer exists (``Train_model_subpixel.py:26``) and is
marked "not tested".  This is a *working* equivalent of the capability:
train SubpixelNet's dense offset head against the fractional residual
maps the label pipeline produces (``labels_res``), alongside the
detector BCE.

Loss semantics follow the reference's ``subpixel_loss_no_argmax``
(``utils/losses.py:177-217``): predicted offsets are read at keypoint
pixels and compared to the ground-truth residuals (masked mean squared
error) — the patch-extraction + soft-argmax variant is the *inference*
path (``ssp.postprocess.points.soft_argmax_refine``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ssp.core.grid import flatten_detection, labels_to_cells
from ssp.losses import detector_loss
from ssp.registry import register
from ssp.train.state import TrainState
from ssp.train.step import cell_valid_mask
from ssp.train.trainer import TrainAgent


def subpixel_map_loss(
    pred: jnp.ndarray, labels_res: jnp.ndarray, labels_2d: jnp.ndarray
) -> jnp.ndarray:
    """Masked MSE between the dense offset map and the residual targets.

    pred [B, H, W, 2]; labels_res [B, H, W, 2]; labels_2d [B, H, W, 1].
    Only keypoint pixels supervise (reference masks by the label map,
    ``utils/losses.py:201-210``).
    """
    mask = labels_2d[..., 0]
    err = jnp.sum((pred.astype(jnp.float32) - labels_res) ** 2, axis=-1) * mask
    return jnp.sum(err) / (jnp.sum(mask) + 1e-6)


def make_subpixel_train_step(
    *,
    det_loss_type: str = "softmax",
    lambda_subpix: float = 1.0,
    donate: bool = True,
):
    """(state, batch, key) → (state, metrics): detector BCE + masked
    subpixel-offset MSE on SubpixelNet."""

    def compute(state: TrainState, batch, params, train: bool):
        variables = {"params": params, "batch_stats": state.batch_stats}
        if train:
            out, mut = state.apply_fn(
                variables, batch["image"], train=True, mutable=["batch_stats"]
            )
            stats = mut["batch_stats"]
        else:
            out = state.apply_fn(variables, batch["image"], train=False)
            stats = state.batch_stats
        cells = labels_to_cells(batch["labels_2d"], add_dustbin=True)  # see step.py: 65-ch always
        cmask = cell_valid_mask(batch["valid_mask"])
        loss_det = detector_loss(out["semi"], cells, cmask, det_loss_type)
        loss_sub = subpixel_map_loss(
            out["subpixel"], batch["labels_res"], batch["labels_2d"]
        )
        loss = loss_det + lambda_subpix * loss_sub
        metrics = {
            "loss": loss,
            "loss_det": loss_det,
            "loss_desc": jnp.zeros(()),
            "loss_subpix": loss_sub,
        }
        return loss, (stats, metrics)

    def train_step(state: TrainState, batch, key):
        del key

        def loss_fn(params):
            return compute(state, batch, params, train=True)

        grads, (stats, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, jnp.zeros_like(state.etas), stats)
        return new_state, metrics

    def eval_step(state: TrainState, batch, key):
        del key
        _, (_, metrics) = compute(state, batch, state.params, train=False)
        return metrics

    donate_args = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_args), jax.jit(eval_step)


@register("agent", "Train_model_subpixel")
class SubpixelTrainAgent(TrainAgent):
    """TrainAgent with the subpixel step in place of the joint step."""

    def _build(self) -> None:
        super()._build()
        m = self.config["model"]
        self.train_step, self.eval_step = make_subpixel_train_step(
            det_loss_type=m.get("detector_loss", {}).get("loss_type", "softmax"),
            lambda_subpix=float(m.get("lambda_subpix", 1.0)),
        )


@register("agent", "Val_model_subpixel")
class SubpixelValAgent:
    """Inference wrapper: dense offsets + offset-refined keypoints
    (working equivalent of the reference's ``Val_model_subpixel``)."""

    def __init__(self, model, variables):
        self.model = model
        self.variables = variables
        self._fwd = jax.jit(
            lambda img: model.apply(variables, img, train=False)
        )

    def run(self, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """images [B, H, W, 1] → {semi, desc, subpixel, heatmap}."""
        out = dict(self._fwd(images))
        out["heatmap"] = flatten_detection(out["semi"])
        return out

    def refine_points(self, images: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
        """Add the predicted offset at each keypoint: pts [B, K, ≥2]
        (x, y[, score]) → refined, same shape."""
        out = self._fwd(images)
        off = out["subpixel"].astype(jnp.float32)  # [B, H, W, 2]

        def one(omap, p):
            ix = jnp.clip(jnp.round(p[:, 0]).astype(jnp.int32), 0, omap.shape[1] - 1)
            iy = jnp.clip(jnp.round(p[:, 1]).astype(jnp.int32), 0, omap.shape[0] - 1)
            return p.at[:, :2].add(omap[iy, ix])

        return jax.vmap(one)(off, pts)
