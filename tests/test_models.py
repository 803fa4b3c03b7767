"""Model forward contracts: shapes, normalization, registry, dtypes."""

import jax
import jax.numpy as jnp
import numpy as np

from ssp.models import build_model


def _init_and_run(model, x, train=False):
    variables = model.init(jax.random.key(0), x, train=True)
    if train:
        out, mutated = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        return out, variables, mutated
    return model.apply(variables, x, train=False), variables, None


class TestSuperPointGauss2:
    def test_shapes_plain(self):
        model = build_model("SuperPointNet_gauss2", dtype=jnp.float32)
        x = jnp.zeros((2, 64, 96, 1))
        out, _, _ = _init_and_run(model, x)
        assert out["semi"].shape == (2, 8, 12, 65)
        assert out["desc"].shape == (2, 8, 12, 256)
        assert "sem" not in out

    def test_shapes_semantic(self):
        model = build_model("SuperPointNet_gauss2_ssmall", n_classes=133, dtype=jnp.float32)
        x = jnp.zeros((1, 64, 96, 1))
        out, _, _ = _init_and_run(model, x)
        assert out["sem"].shape == (1, 64, 96, 133)

    def test_descriptor_l2_normalized(self):
        model = build_model("SuperPointNet_gauss2", dtype=jnp.float32)
        x = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 32, 32, 1)), jnp.float32)
        out, _, _ = _init_and_run(model, x)
        norms = np.linalg.norm(np.asarray(out["desc"]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    def test_batch_stats_update_in_train(self):
        model = build_model("SuperPointNet_gauss2", dtype=jnp.float32)
        x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 32, 32, 1)), jnp.float32)
        out, variables, mutated = _init_and_run(model, x, train=True)
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(
            not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
        )

    def test_bfloat16_path_fp32_outputs(self):
        model = build_model("SuperPointNet_gauss2", dtype=jnp.bfloat16)
        x = jnp.zeros((1, 32, 32, 1))
        out, _, _ = _init_and_run(model, x)
        assert out["semi"].dtype == jnp.float32
        assert out["desc"].dtype == jnp.float32


class TestMagicLeap:
    def test_shapes(self):
        model = build_model("SuperPointNet_pretrained", dtype=jnp.float32)
        x = jnp.zeros((1, 64, 96, 1))
        out, _, _ = _init_and_run(model, x)
        assert out["semi"].shape == (1, 8, 12, 65)
        assert out["desc"].shape == (1, 8, 12, 256)
