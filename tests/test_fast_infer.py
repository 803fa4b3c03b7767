"""Folded-BN fast inference vs the flax train=False forward.

The fast path (``ssp/models/fast_infer.py``) must be a drop-in for
``model.apply(variables, x, train=False)``: same output dict, values
equal to bf16 rounding, and downstream keypoint extraction agreeing
on the detected set.  (Reference inference consumers:
``/root/reference/models/model_wrap.py:64-112``,
``export.py:192-352``.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssp.models import build_model
from ssp.models.fast_infer import make_fast_apply


def _trained_like_variables(model, key, shape):
    """init + a few BN-stat updates so batch_stats are non-trivial."""
    x = jax.random.uniform(key, shape, jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    # run train-mode applies to move running stats off init values
    v = variables
    for i in range(3):
        xi = jax.random.uniform(jax.random.key(10 + i), shape, jnp.float32)
        _, mut = model.apply(v, xi, train=True, mutable=["batch_stats"])
        v = {"params": v["params"], **mut}
    return v


class TestFastInferParity:
    @pytest.mark.parametrize("semantic", [False, True])
    def test_forward_parity(self, semantic):
        H, W = 64, 96  # 16-multiples → packed Pallas stem path
        name = "SuperPointNet_gauss2_ssmall" if semantic else "SuperPointNet_gauss2"
        kwargs = {"n_classes": 7} if semantic else {}
        model = build_model(name, dtype=jnp.bfloat16, **kwargs)
        v = _trained_like_variables(model, jax.random.key(1), (2, H, W, 1))

        x = jax.random.uniform(jax.random.key(2), (2, H, W, 1), jnp.float32)
        ref = model.apply(v, x, train=False)
        fast = jax.jit(
            make_fast_apply(v, input_hw=(H, W), interpret=True, use_packed=True)
        )(x)

        assert set(fast) == set(ref)
        semi_err = np.abs(np.asarray(fast["semi"]) - np.asarray(ref["semi"])).max()
        assert semi_err < 0.15, semi_err  # bf16 rounding through 10 convs
        # descriptors are unit vectors — compare by cosine
        cos = np.sum(
            np.asarray(fast["desc"]) * np.asarray(ref["desc"]), axis=-1
        )
        assert cos.min() > 0.999, cos.min()
        if semantic:
            sem_err = np.abs(np.asarray(fast["sem"]) - np.asarray(ref["sem"])).max()
            scale = np.abs(np.asarray(ref["sem"])).max() + 1e-6
            assert sem_err / scale < 0.05, (sem_err, scale)

    def test_keypoint_agreement(self):
        """End consumers see the same detections."""
        from ssp.core.grid import flatten_detection
        from ssp.postprocess import extract_keypoints

        H, W = 64, 96
        model = build_model("SuperPointNet_gauss2", dtype=jnp.bfloat16)
        v = _trained_like_variables(model, jax.random.key(3), (1, H, W, 1))
        x = jax.random.uniform(jax.random.key(4), (1, H, W, 1), jnp.float32)

        heat_ref = flatten_detection(model.apply(v, x, train=False)["semi"])[0, ..., 0]
        fast = make_fast_apply(v, input_hw=(H, W), interpret=True, use_packed=True)
        heat_fast = flatten_detection(fast(x)["semi"])[0, ..., 0]

        p_ref, v_ref = extract_keypoints(heat_ref, k=50, conf_thresh=0.0,
                                         nms_radius=4, border=4)
        p_fast, v_fast = extract_keypoints(heat_fast, k=50, conf_thresh=0.0,
                                           nms_radius=4, border=4)
        a = {tuple(map(int, p)) for p, ok in zip(np.asarray(p_ref)[:, :2], np.asarray(v_ref)) if ok}
        b = {tuple(map(int, p)) for p, ok in zip(np.asarray(p_fast)[:, :2], np.asarray(v_fast)) if ok}
        # bf16 score jitter may swap tail-rank points; the sets must
        # agree almost everywhere
        inter = len(a & b)
        assert inter >= 0.9 * max(len(a), len(b)), (len(a), len(b), inter)

    def test_drop_in_apply_fn(self):
        """``fast_apply_fn`` is a jit-safe drop-in for ``model.apply``
        (variables as traced args; CPU backend → XLA stem) and
        ``best_apply_fn`` routes by param layout."""
        from ssp.models.fast_infer import best_apply_fn, fast_apply_fn

        H, W = 64, 96
        model = build_model("SuperPointNet_gauss2", dtype=jnp.bfloat16)
        v = _trained_like_variables(model, jax.random.key(7), (1, H, W, 1))
        x = jax.random.uniform(jax.random.key(8), (1, H, W, 1), jnp.float32)

        assert best_apply_fn(model, v) is fast_apply_fn
        ref = model.apply(v, x, train=False)
        # shape-aware routing: packed-profitable shapes keep the fast
        # path, lane-padded shapes (240x320: w_half 160 -> 38% pad,
        # measured slower than flax) return model.apply
        assert best_apply_fn(model, v, input_hw=(480, 640)) is fast_apply_fn
        assert best_apply_fn(model, v, input_hw=(384, 1248)) is fast_apply_fn
        assert best_apply_fn(model, v, input_hw=(240, 320)) == model.apply
        out = jax.jit(fast_apply_fn, static_argnames="train")(v, x, train=False)
        assert np.abs(np.asarray(out["semi"]) - np.asarray(ref["semi"])).max() < 0.15
        # non-foldable layout → flax path
        ml = build_model("SuperPointNet_pretrained")
        vml = ml.init(jax.random.key(0), jnp.zeros((1, H, W, 1)), train=False)
        assert best_apply_fn(ml, dict(vml)) == ml.apply

    def test_xla_fallback_shape(self):
        """H or W not 16-multiples → XLA stem, same contract."""
        H, W = 56, 80
        model = build_model("SuperPointNet_gauss2", dtype=jnp.bfloat16)
        v = _trained_like_variables(model, jax.random.key(5), (1, H, W, 1))
        x = jax.random.uniform(jax.random.key(6), (1, H, W, 1), jnp.float32)
        ref = model.apply(v, x, train=False)
        fast = make_fast_apply(v, input_hw=(H, W), interpret=True)(x)
        assert np.abs(np.asarray(fast["semi"]) - np.asarray(ref["semi"])).max() < 0.15

