"""The jitted training / validation step.

Functional re-design of the reference's ``train_val_sample``
(``Train_model_heatmap_all.py:195-572``): two forwards (original +
warped image), detector BCE on both, descriptor loss across the pair,
optional semantic CE on both, Kendall multi-task combination, one Adam
update.  Everything — label-cell construction, mask reduction, losses,
the optimizer — is one XLA program; per-step host work is zero.

Sharding: the step is jit-ed with batch inputs sharded over the mesh's
``data`` axis and state replicated; the gradient all-reduce is inserted
by the partitioner (ICI), replacing the reference's absent NCCL.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ssp.core.grid import labels_to_cells, space_to_depth
from ssp.losses import (
    descriptor_loss_dense,
    detector_loss,
    multi_task_loss,
    semantic_loss,
    semantic_loss_coarse,
)
from ssp.losses.descriptor_sparse import batch_descriptor_loss_sparse
from ssp.train.state import TrainState


def cell_valid_mask(mask_2d: jnp.ndarray) -> jnp.ndarray:
    """Pixel mask [B, H, W] → cell mask [B, Hc, Wc] (cell valid iff all
    its 64 pixels are valid) — reference ``getMasks``
    (``Train_model_frontend_all.py:373-386``)."""
    cells = space_to_depth(mask_2d[..., None])
    return jnp.prod(cells, axis=-1)


def compute_losses(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    params: Any,
    etas: jnp.ndarray,
    *,
    train: bool,
    semantic: bool,
    warped_pair: bool,
    det_loss_type: str,
    desc_loss: str,
    desc_params: Dict[str, Any],
    lambda_loss: float,
    multi_task: bool,
    ignore_class: int,
    sem_fused: bool = True,
) -> Tuple[jnp.ndarray, Tuple[Any, Dict[str, jnp.ndarray]]]:
    """Pure loss evaluation; returns (loss, (new_batch_stats, metrics))."""

    def forward(img, stats):
        v = {"params": params, "batch_stats": stats}
        # semantic training consumes 1/8-res logits via the fused CE
        # (semantic_loss_coarse) — skip the 650 MB full-res upsample.
        # sem_fused=False keeps the reference's materialize-then-CE
        # (model.fused_semantic_ce: false) for A/B measurement.
        kw = {"upsample_sem": False} if (semantic and sem_fused) else {}
        if train:
            out, mut = state.apply_fn(
                v, img, train=True, mutable=["batch_stats"], **kw
            )
            return out, mut["batch_stats"]
        return state.apply_fn(v, img, train=False, **kw), stats

    out1, stats = forward(batch["image"], state.batch_stats)

    # always 65 channels: the reference pairs its l2 variant with
    # dustbin-less 64-channel labels (Train_model_heatmap_all.py:290-300),
    # which shape-errors against the fixed 65-channel semi head there
    # too — a broken upstream path, not semantics to replicate
    add_dustbin = True
    cells1 = labels_to_cells(batch["labels_2d"], add_dustbin=add_dustbin)
    cmask1 = cell_valid_mask(batch["valid_mask"])
    loss_det = detector_loss(out1["semi"], cells1, cmask1, det_loss_type)

    def sem_ce(out, labels):
        if sem_fused:
            return semantic_loss_coarse(out["sem_coarse"], labels, ignore_class)
        return semantic_loss(out["sem"], labels, ignore_class)

    zero = jnp.zeros((), jnp.float32)
    loss_sem = sem_ce(out1, batch["sem"]) if semantic else zero

    loss_det_warp = zero
    loss_sem_warp = zero
    loss_desc = zero
    pos_term = zero
    neg_term = zero
    cmask2 = None

    if warped_pair:
        out2, stats = forward(batch["warped_image"], stats)
        cells2 = labels_to_cells(batch["warped_labels_2d"], add_dustbin=add_dustbin)
        cmask2 = cell_valid_mask(batch["warped_valid_mask"])
        loss_det_warp = detector_loss(out2["semi"], cells2, cmask2, det_loss_type)
        if semantic:
            loss_sem_warp = sem_ce(out2, batch["warped_sem"])
        if lambda_loss > 0:
            if desc_loss == "dense":
                loss_desc, _, pos_term, neg_term = descriptor_loss_dense(
                    out1["desc"], out2["desc"], batch["H_pair"], cmask2, **desc_params
                )
            else:
                loss_desc, _, pos_term, neg_term = batch_descriptor_loss_sparse(
                    key, out1["desc"], out2["desc"], batch["H_pair"], **desc_params
                )

    if multi_task:
        loss = multi_task_loss(
            etas,
            loss_det + loss_det_warp,
            pos_term,
            neg_term,
            (loss_sem + loss_sem_warp) if semantic else None,
        )
    else:
        loss = loss_det + loss_det_warp + loss_sem + loss_sem_warp
        if lambda_loss > 0:
            loss = loss + lambda_loss * loss_desc

    metrics = {
        "loss": loss,
        "loss_det": loss_det,
        "loss_det_warp": loss_det_warp,
        "loss_desc": loss_desc,
        "loss_sem": loss_sem,
        "loss_sem_warp": loss_sem_warp,
        "positive_dist": pos_term,
        "negative_dist": neg_term,
        "eta_det": etas[0],
        "eta_desc": etas[1],
        "eta_sem": etas[2],
    }
    return loss, (stats, metrics)


def make_train_step(
    *,
    semantic: bool,
    warped_pair: bool,
    det_loss_type: str = "softmax",
    desc_loss: str = "sparse",
    desc_params: Optional[Dict[str, Any]] = None,
    lambda_loss: float = 1.0,
    multi_task: bool = True,
    ignore_class: int = 133,
    donate: bool = True,
    sem_fused: bool = True,
):
    """Build the jitted (state, batch, key) → (state, metrics) step."""
    desc_params = dict(desc_params or {})
    kwargs = dict(
        semantic=semantic,
        warped_pair=warped_pair,
        det_loss_type=det_loss_type,
        desc_loss=desc_loss,
        desc_params=desc_params,
        lambda_loss=lambda_loss,
        multi_task=multi_task,
        ignore_class=ignore_class,
        sem_fused=sem_fused,
    )

    def train_step(state: TrainState, batch, key):
        def loss_fn(trainables):
            return compute_losses(
                state, batch, key, trainables["params"], trainables["etas"],
                train=True, **kwargs,
            )

        grads, (new_stats, metrics) = jax.grad(loss_fn, has_aux=True)(
            {"params": state.params, "etas": state.etas}
        )
        new_state = state.apply_gradients(grads["params"], grads["etas"], new_stats)
        return new_state, metrics

    def eval_step(state: TrainState, batch, key):
        _, (_, metrics) = compute_losses(
            state, batch, key, state.params, state.etas, train=False, **kwargs
        )
        return metrics

    donate_args = (0,) if donate else ()
    return (
        jax.jit(train_step, donate_argnums=donate_args),
        jax.jit(eval_step),
    )


def make_accum_train_step(
    r: int,
    *,
    donate: bool = True,
    **kwargs,
):
    """Reference-exact gradient accumulation: the global batch [r·b, ...]
    is split into r micro-batches, gradients of the per-micro-batch
    losses are **summed** (the reference calls ``loss.backward()`` per
    micro-batch and steps once — ``Train_model_heatmap_all.py:406-413``
    — so the effective gradient is the sum, not the mean), BatchNorm
    statistics chain through the micro-batches (each forward sees batch
    b, as the reference's does), and one optimizer update is applied.

    The default global-batch step differs in exactly two documented
    ways: BN statistics see the full batch, and per-batch loss
    normalizations (mask sums, the dense loss's Σvalid+1) are computed
    over B instead of b.  This mode restores the reference semantics
    when bit-level training parity matters.

    Returns a jitted (state, batch, key) → (state, metrics) with metrics
    averaged over the micro-batches.
    """
    kwargs.setdefault("multi_task", True)

    def train_step(state: TrainState, batch, key):
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape((r, x.shape[0] // r) + x.shape[1:]), batch
        )
        keys = jax.random.split(key, r)

        def body(carry, inp):
            stats, gsum_p, gsum_e = carry
            k, mb = inp

            def loss_fn(trainables):
                return compute_losses(
                    state.replace(batch_stats=stats), mb, k,
                    trainables["params"], trainables["etas"],
                    train=True, **kwargs,
                )

            grads, (new_stats, metrics) = jax.grad(loss_fn, has_aux=True)(
                {"params": state.params, "etas": state.etas}
            )
            gsum_p = jax.tree_util.tree_map(jnp.add, gsum_p, grads["params"])
            gsum_e = gsum_e + grads["etas"]
            return (new_stats, gsum_p, gsum_e), metrics

        zeros_p = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        zeros_e = jnp.zeros_like(state.etas)
        (stats, gsum_p, gsum_e), metrics = jax.lax.scan(
            body, (state.batch_stats, zeros_p, zeros_e), (keys, micro)
        )
        new_state = state.apply_gradients(gsum_p, gsum_e, stats)
        return new_state, jax.tree_util.tree_map(lambda m: jnp.mean(m), metrics)

    donate_args = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_args)
