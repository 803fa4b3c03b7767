"""Loss functions: identity cases, masking, multi-task formula."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssp.core.grid import labels_to_cells
from ssp.losses import (
    descriptor_loss_dense,
    detector_loss,
    init_etas,
    multi_task_loss,
    semantic_loss,
)
from ssp.losses.descriptor_sparse import batch_descriptor_loss_sparse


class TestDetectorLoss:
    def _labels(self, B=2, H=32, W=32, n=5, seed=0):
        rng = np.random.default_rng(seed)
        lab = np.zeros((B, H, W, 1), np.float32)
        for b in range(B):
            ys, xs = rng.integers(0, H, n), rng.integers(0, W, n)
            lab[b, ys, xs, 0] = 1.0
        return jnp.asarray(lab)

    def test_perfect_prediction_low_loss(self):
        labels = self._labels()
        cells = labels_to_cells(labels)
        logits = jnp.log(cells + 1e-9) * 5.0  # sharply correct
        mask = jnp.ones(cells.shape[:3])
        good = detector_loss(logits, cells, mask)
        bad = detector_loss(jnp.zeros_like(logits), cells, mask)
        assert float(good) < float(bad)

    def test_mask_zeroes_regions(self):
        labels = self._labels()
        cells = labels_to_cells(labels)
        logits = jnp.asarray(np.random.default_rng(1).normal(size=cells.shape), jnp.float32)
        full = detector_loss(logits, cells, jnp.ones(cells.shape[:3]))
        none = detector_loss(logits, cells, jnp.zeros(cells.shape[:3]))
        assert float(none) == pytest.approx(0.0, abs=1e-5)
        assert float(full) > 0


class TestSemanticLoss:
    def test_ignore_class(self):
        logits = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8, 4)), jnp.float32)
        labels = jnp.full((1, 8, 8), 4)  # everything ignored (C=4 is ignore)
        assert float(semantic_loss(logits, labels, ignore_class=4)) == pytest.approx(0.0)

    def test_correct_prediction(self):
        labels = jnp.asarray(np.random.default_rng(1).integers(0, 4, (1, 8, 8)))
        logits = jax.nn.one_hot(labels, 4) * 20.0
        assert float(semantic_loss(logits, labels, ignore_class=4)) < 1e-3

    def test_coarse_matches_resize_then_ce(self):
        """semantic_loss_coarse == semantic_loss(jax.image.resize(...))
        exactly (value and gradient) — the fused phase decomposition is
        a reformulation, not an approximation."""
        from ssp.losses import semantic_loss_coarse

        rng = np.random.default_rng(0)
        for B, Hc, Wc, C, s in [(2, 6, 8, 7, 8), (1, 4, 5, 133, 8), (2, 5, 3, 11, 4)]:
            coarse = jnp.asarray(rng.normal(size=(B, Hc, Wc, C)).astype(np.float32))
            labels = jnp.asarray(
                rng.integers(0, C + 1, size=(B, Hc * s, Wc * s)).astype(np.int32)
            )

            def ref_fn(c):
                full = jax.image.resize(c, (B, Hc * s, Wc * s, C), method="linear")
                return semantic_loss(full, labels, ignore_class=C)

            def got_fn(c):
                return semantic_loss_coarse(c, labels, ignore_class=C, scale=s)

            ref, g_ref = jax.value_and_grad(ref_fn)(coarse)
            got, g_got = jax.value_and_grad(got_fn)(coarse)
            assert float(got) == pytest.approx(float(ref), rel=1e-5, abs=1e-5)
            rel = float(jnp.linalg.norm(g_ref - g_got) / (jnp.linalg.norm(g_ref) + 1e-12))
            assert rel < 1e-5

    def test_coarse_all_ignored_finite(self):
        from ssp.losses import semantic_loss_coarse

        coarse = jnp.asarray(np.random.default_rng(2).normal(size=(1, 4, 4, 5)), jnp.float32)
        labels = jnp.full((1, 32, 32), 5)
        assert float(semantic_loss_coarse(coarse, labels, ignore_class=5)) == pytest.approx(0.0)


class TestDenseDescriptorLoss:
    def test_identity_homography_identical_descs(self):
        rng = np.random.default_rng(0)
        d = rng.normal(size=(1, 4, 5, 16)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d = jnp.asarray(d)
        H = jnp.eye(3)[None]
        mask = jnp.ones((1, 4, 5))
        loss, corr, pos, neg = descriptor_loss_dense(d, d, H, mask, lambda_d=1.0)
        # identical descriptors + identity warp: positive pairs have dot=1
        # → pos hinge = 0; the diagonal of corr must be 1
        corr = np.asarray(corr)
        assert corr.reshape(1, 20, 20)[0].diagonal().min() == 1.0
        assert float(pos) == pytest.approx(0.0, abs=1e-5)

    def test_orthogonal_descs_penalized_on_positives(self):
        # desc2 orthogonal to desc1 at matching cells → pos loss > 0
        d1 = np.zeros((1, 2, 2, 4), np.float32)
        d2 = np.zeros((1, 2, 2, 4), np.float32)
        d1[..., 0] = 1.0
        d2[..., 1] = 1.0
        loss, _, pos, neg = descriptor_loss_dense(
            jnp.asarray(d1), jnp.asarray(d2), jnp.eye(3)[None], jnp.ones((1, 2, 2)),
            lambda_d=1.0,
        )
        assert float(pos) > 0
        assert float(neg) == pytest.approx(0.0, abs=1e-6)


class TestSparseDescriptorLoss:
    def test_identity_match_loss_zero(self):
        rng = np.random.default_rng(0)
        d = rng.normal(size=(2, 8, 10, 16)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d = jnp.asarray(d)
        H = jnp.tile(jnp.eye(3), (2, 1, 1))
        total, _, match, nonmatch = batch_descriptor_loss_sparse(
            jax.random.key(0), d, d, H,
            num_matching_attempts=200, num_masked_non_matches_per_match=10,
            method="1d",
        )
        # same descriptor map + identity homography → match dot = 1 → loss 0
        # (the reference ships this exact self-consistency check,
        #  sparse_loss.py:287-345; its default "1d" exact-index path)
        assert float(match) == pytest.approx(0.0, abs=1e-4)
        assert np.isfinite(float(total))

    def test_identity_2d_small(self):
        # bilinear ("2d") sampling interpolates unit vectors, so even the
        # identity case keeps a small positive hinge — must be < random
        rng = np.random.default_rng(2)
        d = rng.normal(size=(1, 8, 10, 64)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d = jnp.asarray(d)
        H = jnp.eye(3)[None]
        _, _, match_same, _ = batch_descriptor_loss_sparse(
            jax.random.key(0), d, d, H,
            num_matching_attempts=200, num_masked_non_matches_per_match=5,
        )
        d2 = jnp.asarray(
            rng.normal(size=(1, 8, 10, 64)).astype(np.float32)
        )
        d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
        _, _, match_rand, _ = batch_descriptor_loss_sparse(
            jax.random.key(0), d, d2, H,
            num_matching_attempts=200, num_masked_non_matches_per_match=5,
        )
        assert float(match_same) < float(match_rand)

    def test_shapes_and_finiteness_random(self):
        rng = np.random.default_rng(1)
        d1 = rng.normal(size=(1, 8, 10, 16)).astype(np.float32)
        d2 = rng.normal(size=(1, 8, 10, 16)).astype(np.float32)
        for d in (d1, d2):
            d /= np.linalg.norm(d, axis=-1, keepdims=True)
        H = jnp.eye(3)[None]
        total, _, m, nm = batch_descriptor_loss_sparse(
            jax.random.key(1), jnp.asarray(d1), jnp.asarray(d2), H,
            num_matching_attempts=100, num_masked_non_matches_per_match=5,
        )
        for v in (total, m, nm):
            assert np.isfinite(float(v))


class TestSparseMXUFormulation:
    """The MXU restructuring (Gram matrix + one-hot contractions,
    descriptor_sparse.py) must be value-equivalent to the plain gather
    formulation it replaced."""

    def test_bilinear_mxu_matches_gather(self):
        from ssp.core.warp import bilinear_sample
        from ssp.losses.descriptor_sparse import _bilinear_mxu

        rng = np.random.default_rng(3)
        dmap = jnp.asarray(rng.normal(size=(8, 10, 16)).astype(np.float32))
        uv = jnp.asarray(
            rng.uniform(-0.5, 10.0, size=(50, 2)).astype(np.float32)
        )
        got = np.asarray(_bilinear_mxu(dmap, uv))
        want = np.asarray(bilinear_sample(dmap, uv))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_rows_mxu_matches_index(self):
        from ssp.losses.descriptor_sparse import _rows_mxu

        rng = np.random.default_rng(4)
        flat = jnp.asarray(rng.normal(size=(80, 16)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 80, size=(33,)))
        np.testing.assert_allclose(
            np.asarray(_rows_mxu(flat, idx)), np.asarray(flat[idx]), atol=1e-6
        )

    def test_full_loss_matches_gather_twin(self):
        """End-to-end: the shipped loss equals a straight-line gather
        re-derivation (same RNG stream, same sampling logic)."""
        from ssp.core.homography import scale_homography, warp_points
        from ssp.core.warp import bilinear_sample
        from ssp.losses.descriptor_sparse import descriptor_loss_sparse

        M, N = 40, 7
        rng = np.random.default_rng(5)
        Hc, Wc, D = 8, 10, 16
        d1 = rng.normal(size=(Hc, Wc, D)).astype(np.float32)
        d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
        d2 = rng.normal(size=(Hc, Wc, D)).astype(np.float32)
        d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
        d1, d2 = jnp.asarray(d1), jnp.asarray(d2)
        Hp = jnp.asarray(
            [[1.02, 0.01, 0.03], [-0.02, 0.98, -0.01], [0.0, 0.0, 1.0]],
            jnp.float32,
        )
        key = jax.random.key(11)

        def gather_twin():
            k_choice, k_nm, k_ps, k_pm = jax.random.split(key, 4)
            vy, vx = jnp.meshgrid(jnp.arange(Hc), jnp.arange(Wc), indexing="ij")
            uv_a = jnp.stack([vx, vy], -1).reshape(-1, 2).astype(jnp.float32)
            H_cells = scale_homography(Hp, (Hc, Wc))
            uv_b = jnp.round(warp_points(uv_a, H_cells))
            valid = ((uv_b[:, 0] >= 0) & (uv_b[:, 0] <= Wc - 1)
                     & (uv_b[:, 1] >= 0) & (uv_b[:, 1] <= Hc - 1))
            logits = jnp.where(valid, 0.0, -1e9)
            choice = jax.random.categorical(k_choice, logits, shape=(M,))
            m_a, m_b = uv_a[choice], uv_b[choice]
            scale = jnp.array([(Wc - 1) / Wc, (Hc - 1) / Hc])
            da = bilinear_sample(d1, m_a * scale)
            db = bilinear_sample(d2, m_b * scale)
            match = jnp.mean(jnp.maximum(1.0 - jnp.sum(da * db, -1), 0.0))

            rand_flat = jax.random.randint(k_nm, (M * N,), 0, Hc * Wc)
            nm_u = (rand_flat % Wc).astype(jnp.float32).reshape(M, N)
            nm_v = (rand_flat // Wc).astype(jnp.float32).reshape(M, N)
            du = jnp.abs(m_b[:, 0:1] - nm_u)
            dv = jnp.abs(m_b[:, 1:2] - nm_v)
            close = ((du < 1.0) | (dv < 1.0)).reshape(-1)
            sign = jnp.floor(jax.random.uniform(k_ps, (M * N,)) * 2.0) - 0.5
            noise = jax.random.normal(k_pm, (M * N,)) * 10.0 + sign
            pert = jnp.where(close, noise, 0.0).reshape(M, N)

            def wrap(x, upper):
                x = jnp.where(x > upper, x - upper, x)
                return jnp.where(x < 0.0, x + upper, x)

            nm_u = wrap(nm_u + pert, float(Wc - 1))
            nm_v = wrap(nm_v + pert, float(Hc - 1))
            fb = d2.reshape(-1, D)
            fa = d1.reshape(-1, D)
            idx_b = (jnp.clip(nm_u.astype(jnp.int32), 0, Wc - 1)
                     + jnp.clip(nm_v.astype(jnp.int32), 0, Hc - 1) * Wc)
            idx_a = (m_a[:, 0].astype(jnp.int32)
                     + m_a[:, 1].astype(jnp.int32) * Wc)[:, None]
            dot = jnp.sum(fa[jnp.broadcast_to(idx_a, (M, N))] * fb[idx_b], -1)
            hinge = jnp.maximum(dot - 0.2, 0.0)
            non_match = jnp.sum(hinge) / (jnp.sum(hinge > 0.0) + 1.0)
            return match + non_match, match, non_match

        got = descriptor_loss_sparse(
            key, d1, d2, Hp, num_matching_attempts=M,
            num_masked_non_matches_per_match=N, method="2d",
        )
        want = gather_twin()
        for g, w in zip(got, want):
            assert float(g) == pytest.approx(float(w), abs=2e-5)


class TestMultiTaskLoss:
    def test_formula(self):
        etas = init_etas()
        det, pos, neg, sem = 2.0, 0.5, 0.3, 1.5
        got = float(multi_task_loss(etas, det, pos, neg, sem))
        e = np.array([1.0, 2.0, 1.0])
        want = (
            det * np.exp(-e[0]) + e[0]
            + 0.5 * (pos + neg) * np.exp(-e[1]) + 0.5 * e[1]
            + sem * np.exp(-e[2]) + e[2]
        )
        assert got == pytest.approx(want, rel=1e-6)

    def test_no_semantic_branch(self):
        etas = init_etas()
        got = float(multi_task_loss(etas, 1.0, 0.1, 0.1))
        e = np.array([1.0, 2.0, 1.0])
        want = np.exp(-e[0]) + e[0] + 0.5 * 0.2 * np.exp(-e[1]) + 0.5 * e[1]
        assert got == pytest.approx(want, rel=1e-6)

    def test_gradient_flows_to_etas(self):
        g = jax.grad(lambda e: multi_task_loss(e, 1.0, 0.1, 0.1, 0.5))(init_etas())
        assert np.abs(np.asarray(g)).min() > 0


class TestDenseLossTrainStep:
    def test_train_step_dense(self):
        """The dense descriptor-loss config path drives a full step."""
        import jax
        from ssp.data.pipeline import prepare_batch
        from ssp.models import build_model
        from ssp.train import create_train_state, make_train_step

        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.uniform(size=(2, 32, 48)).astype(np.float32))
        points = jnp.asarray(rng.uniform(4, 28, (2, 6, 2)).astype(np.float32))
        batch = prepare_batch(
            jax.random.key(0), images, points, jnp.ones((2, 6), bool),
            warped_pair={"enable": True, "params": {"allow_artifacts": True}},
        )
        model = build_model("SuperPointNet_gauss2", dtype=jnp.float32)
        state = create_train_state(model, jax.random.key(1), (1, 32, 48, 1))
        step, _ = make_train_step(
            semantic=False, warped_pair=True, desc_loss="dense",
            desc_params={"lambda_d": 250.0, "descriptor_dist": 4.0},
            lambda_loss=1.0, multi_task=True,
        )
        state, metrics = step(state, batch, jax.random.key(2))
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["positive_dist"]) >= 0
