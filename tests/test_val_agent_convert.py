"""ValAgent inference surface + StableHLO deployment round-trip."""

import numpy as np
import jax
import jax.numpy as jnp

from ssp.train.val_agent import ValAgent


def _cfg(**model_extra):
    return {
        "model": {
            "name": "SuperPointNet_gauss2",
            "params": {"dtype": jnp.float32},
            "detection_threshold": 0.0,
            "nms": 4,
            "top_k": 30,
            "subpixel": {"enable": True, "patch_size": 5},
            **model_extra,
        }
    }


class TestValAgent:
    def test_run_pts_desc(self):
        agent = ValAgent(_cfg(), input_hw=(48, 64))
        agent.init_random()
        img = np.random.default_rng(0).uniform(size=(48, 64)).astype(np.float32)
        heat = agent.run(img)
        assert heat.shape == (48, 64)
        pts = agent.heatmap_to_pts()
        desc = agent.desc_to_sparseDesc()
        assert pts.shape[1] == 3 and pts.shape[0] <= 30
        assert desc.shape == (pts.shape[0], 256)
        np.testing.assert_allclose(np.linalg.norm(desc, axis=1), 1.0, atol=1e-4)

    def test_registry_name(self):
        from ssp import registry

        assert registry.get("agent", "Val_model_heatmap") is ValAgent


class TestConvertDeploy:
    def test_stablehlo_roundtrip(self, tmp_path):
        from jax import export as jexport

        from ssp.cli.convert2script import export_model

        out = export_model(_cfg(), tmp_path / "m.stablehlo", 1, 48, 64)
        restored = jexport.deserialize(out.read_bytes())
        res = restored.call(jnp.zeros((1, 48, 64, 1)))
        assert res[0].shape == (1, 6, 8, 65)
        assert res[1].shape == (1, 6, 8, 256)

    def test_keep_sem(self, tmp_path):
        from jax import export as jexport

        from ssp.cli.convert2script import export_model

        cfg = {
            "model": {
                "name": "SuperPointNet_gauss2_ssmall",
                "params": {"n_classes": 7, "dtype": jnp.float32},
            }
        }
        out = export_model(cfg, tmp_path / "s.stablehlo", 1, 48, 64, keep_sem=True)
        restored = jexport.deserialize(out.read_bytes())
        res = restored.call(jnp.zeros((1, 48, 64, 1)))
        assert res[2].shape == (1, 48, 64, 7)
