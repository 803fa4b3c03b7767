"""Multi-device (virtual 8-CPU mesh) coverage of the sharded paths:
HA export groups sharded over the mesh (incl. a non-divisible final
group) and the stacked multi-step trainer sharding.  SURVEY.md §2.7."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssp.export.homography_adaptation import make_ha_fn, run_ha_export
from ssp.models import build_model
from ssp.parallel import make_mesh


@pytest.fixture(scope="module")
def tiny_ha_fn():
    model = build_model("SuperPointNet_gauss2", dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    return make_ha_fn(
        model.apply, variables, num_h=4, top_k=16, conf_thresh=0.0,
        nms_radius=2, chunk=8, use_twopass=False,
    )


def _images(n, hw=(32, 32), seed=0):
    rng = np.random.default_rng(seed)
    return [(f"img_{i:03d}", rng.uniform(size=hw).astype(np.float32))
            for i in range(n)]


class TestShardedHAExport:
    def test_mesh_group_nondivisible(self, tiny_ha_fn, tmp_path):
        """10 images, group=8 over the 8-device mesh: the final group of
        2 is padded to 8 (run_ha_export pads with the last image) — the
        exact configuration that only breaks under sharding."""
        mesh = make_mesh()
        assert len(mesh.devices.ravel()) == 8
        out = tmp_path / "sharded"
        n = run_ha_export(
            tiny_ha_fn, _images(10), out, seed=3, group=8, mesh=mesh,
        )
        assert n == 10
        files = sorted(out.glob("*.npz"))
        assert len(files) == 10
        for f in files:
            pts = np.load(f)["pts"]
            assert np.isfinite(pts).all()
            assert pts.ndim == 2 and pts.shape[1] == 3
            if len(pts):
                assert pts[:, 0].max() < 32 and pts[:, 1].max() < 32

        # resume-by-skip still holds on the mesh path
        again = run_ha_export(
            tiny_ha_fn, _images(10), out, seed=3, group=8, mesh=mesh,
        )
        assert again == 0

    def test_mesh_matches_single_device(self, tiny_ha_fn, tmp_path):
        """Sharding is a performance decision, not a semantic one: the
        mesh run must produce the same keypoints as the unsharded run
        (same per-image RNG keys by construction)."""
        mesh = make_mesh()
        a = tmp_path / "mesh"
        b = tmp_path / "single"
        run_ha_export(tiny_ha_fn, _images(10), a, seed=7, group=8, mesh=mesh)
        run_ha_export(tiny_ha_fn, _images(10), b, seed=7, group=1)
        for f in sorted(a.glob("*.npz")):
            pa = np.load(f)["pts"]
            pb = np.load(b / f.name)["pts"]
            assert pa.shape == pb.shape, f.name
            # sort by (y, x) — top-k tie order may differ across layouts
            ka = pa[np.lexsort((pa[:, 0], pa[:, 1]))]
            kb = pb[np.lexsort((pb[:, 0], pb[:, 1]))]
            np.testing.assert_allclose(ka[:, :2], kb[:, :2], atol=0)
            np.testing.assert_allclose(ka[:, 2], kb[:, 2], atol=1e-5)


class TestBatchNormSharding:
    def test_bn_stats_are_global_batch_under_sharding(self):
        """Under jit, BN batch statistics reduce over the GLOBAL batch —
        GSPMD partitions the mean/var reduction and inserts the
        collective — so sharding is semantics-neutral and the shipped
        configs reproduce the reference's batch-16 BN exactly (SURVEY §7
        open decision, resolved)."""
        from ssp.parallel import shard_batch

        model = build_model("SuperPointNet_gauss2", dtype=jnp.float32)
        x = jnp.asarray(
            np.random.default_rng(0).uniform(size=(8, 32, 32, 1)).astype(np.float32)
        )
        variables = model.init(jax.random.key(0), x[:1], train=True)

        @jax.jit
        def stats_of(v, xx):
            _, mut = model.apply(v, xx, train=True, mutable=["batch_stats"])
            return mut["batch_stats"]

        plain = stats_of(variables, x)
        mesh = make_mesh()
        with mesh:
            sharded = stats_of(variables, shard_batch(x, mesh))
        for a, b in zip(jax.tree_util.tree_leaves(plain),
                        jax.tree_util.tree_leaves(sharded)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_bn_cross_replica_under_shard_map(self):
        """``bn_cross_replica=True`` binds BN's ``axis_name`` so that
        under ``shard_map`` (where reductions are per-device, unlike
        jit/GSPMD) the statistics are still the GLOBAL-batch ones: the
        shard_map forward must reproduce the unsharded global-batch
        forward — both outputs and updated batch_stats."""
        from jax.sharding import PartitionSpec as P

        from ssp.parallel import DATA_AXIS

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(size=(8, 16, 16, 1)).astype(np.float32))

        cross = build_model(
            "SuperPointNet_gauss2", dtype=jnp.float32, bn_cross_replica=True
        )
        plain = build_model("SuperPointNet_gauss2", dtype=jnp.float32)
        variables = plain.init(jax.random.key(0), x[:1], train=True)

        @jax.jit
        def global_fwd(v, xx):
            out, mut = plain.apply(v, xx, train=True, mutable=["batch_stats"])
            return out["semi"], mut["batch_stats"]

        semi_ref, stats_ref = global_fwd(variables, x)

        def shard_fwd(v, xx):
            out, mut = cross.apply(v, xx, train=True, mutable=["batch_stats"])
            return out["semi"], mut["batch_stats"]

        mesh = make_mesh()
        semi_sm, stats_sm = jax.jit(
            jax.shard_map(
                shard_fwd,
                mesh=mesh,
                in_specs=(P(), P(DATA_AXIS)),
                out_specs=(P(DATA_AXIS), P()),
            )
        )(variables, x)

        np.testing.assert_allclose(
            np.asarray(semi_sm), np.asarray(semi_ref), atol=2e-4
        )
        for a, b in zip(jax.tree_util.tree_leaves(stats_sm),
                        jax.tree_util.tree_leaves(stats_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestShardedTrainer:
    def test_multistep_sharded_full_mesh(self, tmp_path):
        """steps_per_dispatch stacking + axis-1 sharding over all 8
        devices (global batch 8)."""
        from ssp.data.synthetic_dataset import SyntheticShapesDataset
        from ssp.train.trainer import TrainAgent
        from ssp.utils.experiment import ExperimentPaths

        config = {
            "data": {
                "preprocessing": {"resize": [48, 64]},
                "augmentation": {
                    "photometric": {"enable": False},
                    "homographic": {"enable": False},
                },
                "warped_pair": {"enable": False},
            },
            "model": {
                "name": "SuperPointNet_gauss2",
                "params": {"dtype": jnp.float32},
                "batch_size": 8,
                "learning_rate": 0.01,
                "lambda_loss": 0,
            },
            "train_iter": 4,
            "validation_interval": 100,
            "tensorboard_interval": 2,
            "save_interval": 4,
            "steps_per_dispatch": 2,
        }
        exper = ExperimentPaths("multichip_multistep", tmp_path)
        agent = TrainAgent(config, save_path=exper)
        assert len(agent.mesh.devices.ravel()) == 8
        ds = SyntheticShapesDataset(
            task="train", primitives=["draw_polygon"],
            generation={"split_sizes": {"training": 8}},
            cache_dir=tmp_path / "synth", preprocessing={"resize": [48, 64]},
        )
        agent.train_loader = ds.batches(8, seed=0)
        agent.train()
        assert int(agent.state.step) == 4
