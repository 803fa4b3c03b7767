"""Exact gradient-accumulation mode (reference semantics: summed
micro-batch gradients, chained BN stats, one optimizer step —
Train_model_heatmap_all.py:406-413)."""

import numpy as np
import jax
import jax.numpy as jnp

from ssp.data.pipeline import prepare_batch
from ssp.models import build_model
from ssp.train.state import create_train_state
from ssp.train.step import compute_losses, make_accum_train_step, make_train_step

KW = dict(
    semantic=False, warped_pair=True, det_loss_type="softmax",
    desc_loss="dense", desc_params={}, lambda_loss=1.0, multi_task=True,
    ignore_class=133,
)


def _batch(B=4, H=32, W=32, seed=0):
    rng = np.random.default_rng(seed)
    images = jnp.asarray(rng.uniform(size=(B, H, W)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(4, 28, (B, 6, 2)).astype(np.float32))
    valid = jnp.ones((B, 6), bool)
    return prepare_batch(
        jax.random.key(9), images, pts, valid,
        warped_pair={"enable": True, "params": {"allow_artifacts": True}},
    )


def test_accum_matches_eager_reference():
    """The scanned accumulation must equal the eager loop: per-micro
    grads with chained batch stats, summed, one apply_gradients."""
    import optax

    r, b = 2, 2
    model = build_model("SuperPointNet_gauss2", dtype=jnp.float32)
    # SGD: the update is linear in the gradient, so ~1e-6 fp noise in
    # grads stays ~1e-7 in params (Adam's g/|g| normalization would
    # amplify noise on near-zero gradients to full-step size)
    state = create_train_state(model, jax.random.key(0), (1, 32, 32, 1),
                               tx=optax.sgd(0.1))
    batch = _batch(B=r * b)
    key = jax.random.key(3)

    accum = make_accum_train_step(r, donate=False, **KW)
    new_state, metrics = accum(state, batch, key)
    assert np.isfinite(float(metrics["loss"]))

    # eager reference
    keys = jax.random.split(key, r)
    micro = jax.tree_util.tree_map(
        lambda x: x.reshape((r, b) + x.shape[1:]), batch
    )
    stats = state.batch_stats
    gsum = None
    for i in range(r):
        mb = jax.tree_util.tree_map(lambda x: x[i], micro)

        def loss_fn(tr, stats=stats, mb=mb, k=keys[i]):
            return compute_losses(
                state.replace(batch_stats=stats), mb, k,
                tr["params"], tr["etas"], train=True, **KW,
            )

        grads, (stats, _) = jax.grad(loss_fn, has_aux=True)(
            {"params": state.params, "etas": state.etas}
        )
        gsum = grads if gsum is None else jax.tree_util.tree_map(
            jnp.add, gsum, grads
        )
    want = state.apply_gradients(gsum["params"], gsum["etas"], stats)

    for got, ref in zip(
        jax.tree_util.tree_leaves(new_state.params),
        jax.tree_util.tree_leaves(want.params),
    ):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state.etas), np.asarray(want.etas), atol=1e-6
    )
    for got, ref in zip(
        jax.tree_util.tree_leaves(new_state.batch_stats),
        jax.tree_util.tree_leaves(want.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6, rtol=1e-5)


def test_accum_gradient_is_sum_not_mean():
    """With identical micro-batches, the accumulated update must be the
    r-times update of one micro-batch (the reference sums backward()
    increments), distinguishing sum from mean semantics."""
    r, b = 2, 2
    kw = dict(KW, warped_pair=False, lambda_loss=0.0, multi_task=False)
    model = build_model("SuperPointNet_gauss2", dtype=jnp.float32)
    # plain SGD so updates are linear in the gradient
    import optax

    state = create_train_state(model, jax.random.key(0), (1, 32, 32, 1),
                               tx=optax.sgd(0.1))
    one = _batch(B=b, seed=5)
    doubled = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x, x], axis=0), one
    )
    key = jax.random.key(1)
    k0 = jax.random.split(key, r)[0]

    accum = make_accum_train_step(r, donate=False, **kw)
    got, _ = accum(state, doubled, key)

    def loss_fn(tr):
        return compute_losses(state, one, k0, tr["params"], tr["etas"],
                              train=True, **kw)

    grads, (stats, _) = jax.grad(loss_fn, has_aux=True)(
        {"params": state.params, "etas": state.etas}
    )
    # keys differ between the two micro-steps only through the sparse
    # loss (disabled here), so grads are identical: sum = 2×g
    two_g = jax.tree_util.tree_map(lambda g: 2.0 * g, grads["params"])
    want = state.apply_gradients(two_g, 2.0 * grads["etas"], stats)
    for a, b_ in zip(jax.tree_util.tree_leaves(got.params),
                     jax.tree_util.tree_leaves(want.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-6, rtol=1e-5)


def test_trainer_flag_selects_accum(tmp_path):
    from ssp.train.trainer import TrainAgent
    from ssp.utils.experiment import ExperimentPaths

    config = {
        "data": {
            "preprocessing": {"resize": [32, 32]},
            "augmentation": {"photometric": {"enable": False},
                             "homographic": {"enable": False}},
            "warped_pair": {"enable": False},
        },
        "model": {
            "name": "SuperPointNet_gauss2",
            "params": {"dtype": jnp.float32},
            "batch_size": 2,
            "real_batch_size": 4,
            "exact_accumulation": True,
            "learning_rate": 0.01,
            "lambda_loss": 0,
        },
        "train_iter": 2,
        "validation_interval": 100,
        "tensorboard_interval": 100,
        "save_interval": 100,
    }
    exper = ExperimentPaths("accum_flag", tmp_path)
    agent = TrainAgent(config, save_path=exper)
    assert agent.r == 2
    # the accum step is a single-arg jitted callable, not the tuple path
    batch = _batch(B=4, seed=7)
    batch.pop("warped_image"), batch.pop("warped_labels_2d")
    batch.pop("warped_valid_mask"), batch.pop("H_pair")
    batch.pop("H_pair_inv"), batch.pop("warped_res")
    state, metrics = agent.train_step(agent.state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
