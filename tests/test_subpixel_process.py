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


class TestSubpixelAgents:
    def test_train_agent_runs_and_loss_drops(self, tmp_path):
        """Working Train_model_subpixel (the reference's is dead code —
        Train_model_subpixel.py:26 imports a removed module)."""
        import jax.numpy as jnp

        from ssp import registry
        from ssp.data.synthetic_dataset import SyntheticShapesDataset
        from ssp.utils.experiment import ExperimentPaths

        config = {
            "data": {
                "preprocessing": {"resize": [48, 64]},
                "augmentation": {"photometric": {"enable": False},
                                 "homographic": {"enable": False}},
                "warped_pair": {"enable": False},
            },
            "model": {
                "name": "SubpixelNet",
                "params": {"dtype": jnp.float32},
                "batch_size": 4,
                "learning_rate": 0.01,
                "lambda_subpix": 1.0,
            },
            "train_iter": 4,
            "validation_interval": 100,
            "tensorboard_interval": 2,
            "save_interval": 100,
            "validation_size": 0,
        }
        agent_cls = registry.get("agent", "Train_model_subpixel")
        exper = ExperimentPaths("subpix_train", tmp_path)
        agent = agent_cls(config, save_path=exper)
        ds = SyntheticShapesDataset(
            task="train", primitives=["draw_polygon"],
            generation={"split_sizes": {"training": 8}},
            cache_dir=tmp_path / "synth", preprocessing={"resize": [48, 64]},
        )
        agent.train_loader = ds.batches(4, seed=0)
        agent.train()
        import json

        rows = [json.loads(l) for l in
                (exper.root / "metrics_train.jsonl").read_text().splitlines()]
        assert all(np.isfinite(r["loss"]) for r in rows)
        assert "loss_subpix" in rows[-1]

    def test_val_agent_refines_points(self):
        import jax
        import jax.numpy as jnp

        from ssp.models import build_model
        from ssp.train.subpixel_agent import SubpixelValAgent

        model = build_model("SubpixelNet", dtype=jnp.float32)
        img = jnp.zeros((1, 32, 32, 1))
        variables = model.init(jax.random.key(0), img, train=False)
        agent = SubpixelValAgent(model, variables)
        out = agent.run(img)
        assert out["subpixel"].shape == (1, 32, 32, 2)
        assert out["heatmap"].shape == (1, 32, 32, 1)
        pts = jnp.array([[[4.0, 5.0, 0.9], [10.0, 20.0, 0.5]]])
        refined = np.asarray(agent.refine_points(img, pts))
        off = np.asarray(out["subpixel"][0])
        np.testing.assert_allclose(refined[0, 0, :2], [4 + off[5, 4, 0], 5 + off[5, 4, 1]], atol=1e-5)
        np.testing.assert_allclose(refined[0, :, 2], [0.9, 0.5])
