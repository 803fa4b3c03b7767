"""SubpixelNet model, subpixel residual loss, batched processor."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssp.losses.subpixel import subpixel_residual_loss
from ssp.models import build_model
from ssp.postprocess.process import SuperPointProcess


class TestSubpixelNet:
    def test_shapes(self):
        model = build_model("SubpixelNet", dtype=jnp.float32)
        x = jnp.zeros((1, 32, 48, 1))
        v = model.init(jax.random.key(0), x, train=True)
        out = model.apply(v, x, train=False)
        assert out["semi"].shape == (1, 4, 6, 65)
        assert out["desc"].shape == (1, 4, 6, 256)
        assert out["subpixel"].shape == (1, 32, 48, 2)


class TestSubpixelLoss:
    def test_perfect_peak_zero_residual(self):
        heat = np.zeros((32, 32), np.float32)
        heat[10, 20] = 1.0
        pts = jnp.array([[20.0, 10.0]])
        res = jnp.zeros((1, 2))
        loss = subpixel_residual_loss(jnp.asarray(heat), pts, res, jnp.array([True]))
        assert float(loss) < 1e-4

    def test_shifted_mass_matches_residual(self):
        heat = np.zeros((32, 32), np.float32)
        heat[10, 20] = 1.0
        heat[10, 21] = 1.0  # centroid at x=20.5
        pts = jnp.array([[20.0, 10.0]])
        good = subpixel_residual_loss(
            jnp.asarray(heat), pts, jnp.array([[0.5, 0.0]]), jnp.array([True])
        )
        bad = subpixel_residual_loss(
            jnp.asarray(heat), pts, jnp.array([[-0.5, 0.0]]), jnp.array([True])
        )
        assert float(good) < float(bad)

    def test_no_valid_points(self):
        loss = subpixel_residual_loss(
            jnp.zeros((16, 16)), jnp.zeros((2, 2)), jnp.zeros((2, 2)),
            jnp.zeros((2,), bool),
        )
        assert float(loss) == 0.0


class TestSuperPointProcess:
    def test_pipeline(self):
        rng = np.random.default_rng(0)
        heat = (rng.uniform(size=(2, 32, 32)) ** 6).astype(np.float32)
        desc = rng.normal(size=(2, 4, 4, 16)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
        sp = SuperPointProcess(out_num_points=20, conf_thresh=0.0)
        nms = sp.heatmap_to_nms(jnp.asarray(heat))
        assert nms.shape == heat.shape
        outs = sp.pred_soft_argmax(nms, jnp.asarray(heat))
        assert outs["pred"].shape == (2, 20, 2)
        feats = sp.batch_extract_features(jnp.asarray(desc), nms, outs["pred"])
        assert feats["pts_desc"].shape == (2, 20, 16)
        assert feats["pts_int"].shape == (2, 20, 2)
