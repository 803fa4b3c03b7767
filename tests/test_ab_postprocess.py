"""Bench-grade vs export-grade post-processing agreement (VERDICT r4
task #2): ``bench.py`` ships ``lax.approx_max_k`` (recall 0.95) + MXU
descriptor sampling while exports default to exact ``lax.top_k`` +
gather sampling.  These tests pin the two variants to each other at the
unit level so the fast path can never drift silently.

Reference export post-processing: ``models/model_wrap.py:337-423``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssp.export.descriptors_export import make_detect_describe_var_fn
from ssp.models import build_model
from ssp.postprocess.points import sample_descriptors, sample_descriptors_mxu

H_IMG, W_IMG = 120, 160


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_model("SuperPointNet_gauss2_ssmall", dtype=jnp.float32)
    variables = model.init(
        jax.random.key(3), jnp.zeros((1, H_IMG, W_IMG, 1), jnp.float32),
        train=False,
    )
    return model, variables


def _image(seed=0):
    rng = np.random.default_rng(seed)
    im = rng.uniform(size=(H_IMG, W_IMG)).astype(np.float32)
    return jnp.asarray(im)


def test_approx_topk_recovers_exact_set(model_and_vars):
    """approx_max_k keypoints at recall_target 0.95 must reproduce at
    least 90% of the exact top-k set (the bench↔export contract); on
    CPU the fallback is exact so the overlap is 100%, and the TPU A/B
    (scripts/ab_postprocess.py, evidence/ab_postprocess_*.json)
    establishes the metric-level neutrality."""
    model, variables = model_and_vars
    k = 300
    fn_exact = make_detect_describe_var_fn(
        model.apply, top_k=k, conf_thresh=-1e9, nms_radius=4,
        subpixel=False, topk_method="exact", desc_sampler="gather")
    fn_approx = make_detect_describe_var_fn(
        model.apply, top_k=k, conf_thresh=-1e9, nms_radius=4,
        subpixel=False, topk_method="approx", desc_sampler="mxu")
    img = _image()
    pe, ve, de = jax.device_get(fn_exact(variables, img))
    pa, va, da = jax.device_get(fn_approx(variables, img))

    set_e = {tuple(p) for p in pe[:, :2].astype(int).tolist()}
    set_a = {tuple(p) for p in pa[:, :2].astype(int).tolist()}
    overlap = len(set_e & set_a) / max(len(set_e), 1)
    assert overlap >= 0.90, overlap
    # identical score ordering where the sets agree: top-scoring point
    # must match exactly
    assert tuple(pe[0, :2]) in set_a


def test_mxu_sampler_matches_gather_sampler(model_and_vars):
    """The one-hot-matmul descriptor sampler must agree with the gather
    sampler leaf-for-leaf at integer keypoint coordinates."""
    model, variables = model_and_vars
    out = model.apply(variables, _image(1)[None, ..., None], train=False)
    desc_map = out["desc"][0]
    Hc, Wc, _ = desc_map.shape
    rng = np.random.default_rng(7)
    pts = np.stack([
        rng.integers(0, Wc * 8, 64).astype(np.float32),
        rng.integers(0, Hc * 8, 64).astype(np.float32),
        rng.uniform(size=64).astype(np.float32),
    ], axis=-1)
    d_gather = np.asarray(sample_descriptors(desc_map, jnp.asarray(pts)))
    d_mxu = np.asarray(sample_descriptors_mxu(desc_map, jnp.asarray(pts)))
    # the MXU sampler's contract is bf16 operands / fp32 accumulation
    # (points.py:95-97): agreement bound is bf16 rounding, not fp32
    np.testing.assert_allclose(d_mxu, d_gather, atol=2e-3)
    # unit-norm descriptors → cosine similarity is the metric-relevant
    # agreement; bf16 rounding must not rotate descriptors measurably
    cos = (d_mxu * d_gather).sum(-1)
    assert cos.min() > 0.99999, cos.min()


def test_bench_pipeline_points_match_export_exact():
    """The exact bench kernel composition (flatten → Pallas-equivalent
    NMS → top-k) and the export composition agree on the detected point
    set for the same heatmap — guards the two code paths' NMS/border
    conventions against drift."""
    from ssp.core.grid import flatten_detection
    from ssp.postprocess.nms import batched_nms
    from ssp.postprocess.points import extract_keypoints

    rng = np.random.default_rng(11)
    semi = jnp.asarray(rng.normal(size=(1, H_IMG // 8, W_IMG // 8, 65))
                       .astype(np.float32))
    heat = flatten_detection(semi)[0, ..., 0]
    nmsed = batched_nms(heat[None], 4, iterations=3, border=4)[0]

    k = 200
    # bench-side: flat top-k over the NMSed map
    scores_b, idx = jax.lax.top_k(nmsed.reshape(-1), k)
    pts_b = np.stack([np.asarray(idx) % W_IMG, np.asarray(idx) // W_IMG],
                     axis=-1)
    # export-side
    pts_e, valid, _ = jax.device_get(
        (lambda: extract_keypoints(
            nmsed, k=k, conf_thresh=-1e9, nms_radius=0, border=0,
            nms_iterations=1) + (None,))())
    set_b = {tuple(p) for p in pts_b.tolist()}
    set_e = {tuple(p) for p in pts_e[:, :2].astype(int).tolist()}
    assert len(set_b & set_e) / k >= 0.99
