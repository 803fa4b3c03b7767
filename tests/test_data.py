"""Data layer: synthetic generation, dataset cache, device pipeline,
photometric augmentation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssp.data.photometric import gaussian_blur, photometric_augment
from ssp.data.pipeline import pad_points, prepare_batch, splat_labels
from ssp.data.synthetic_dataset import SyntheticShapesDataset
from ssp.data.synthetic_shapes import PRIMITIVES, generate_sample


class TestGenerator:
    @pytest.mark.parametrize("prim", PRIMITIVES)
    def test_all_primitives(self, prim):
        img, pts = generate_sample(prim, size=(60, 80), seed=1)
        assert img.shape == (60, 80)
        assert img.dtype == np.float32
        assert 0.0 <= img.min() and img.max() <= 1.0
        if prim in ("draw_ellipses", "gaussian_noise"):
            assert len(pts) == 0
        if len(pts):
            assert (pts[:, 0] <= 79).all() and (pts[:, 1] <= 59).all()

    def test_deterministic(self):
        a = generate_sample("draw_checkerboard", size=(60, 80), seed=7)
        b = generate_sample("draw_checkerboard", size=(60, 80), seed=7)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])


class TestSyntheticDataset:
    def test_cache_and_batches(self, tmp_path):
        ds = SyntheticShapesDataset(
            task="train",
            primitives=["draw_polygon", "draw_star"],
            generation={"split_sizes": {"training": 6}},
            cache_dir=tmp_path,
            preprocessing={"resize": [48, 64]},
        )
        assert len(ds) == 12
        it = ds.batches(4, seed=0)
        b = next(it)
        assert b["image"].shape == (4, 48, 64)
        assert b["points"].shape[0] == 4
        # cache reuse: second instance loads without regeneration
        ds2 = SyntheticShapesDataset(
            task="train",
            primitives=["draw_polygon", "draw_star"],
            generation={"split_sizes": {"training": 6}},
            cache_dir=tmp_path,
            preprocessing={"resize": [48, 64]},
        )
        np.testing.assert_array_equal(ds2._images, ds._images)


class TestSplatLabels:
    def test_points_land(self):
        pts = jnp.array([[3.4, 5.6], [0.0, 0.0], [100.0, 2.0]])
        valid = jnp.array([True, True, True])
        m = np.asarray(splat_labels(pts, valid, (16, 16)))
        assert m[6, 3] == 1.0 and m[0, 0] == 1.0
        assert m.sum() == 2.0  # out-of-bounds dropped

    def test_invalid_dropped(self):
        pts = jnp.array([[3.0, 3.0]])
        m = np.asarray(splat_labels(pts, jnp.array([False]), (8, 8)))
        assert m.sum() == 0


class TestPhotometric:
    def test_all_primitives_run_and_bound(self):
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.uniform(0.2, 0.8, (2, 48, 64)).astype(np.float32))
        out = photometric_augment(jax.random.key(0), imgs)
        out = np.asarray(out)
        assert out.shape == imgs.shape
        assert out.min() >= 0.0 and out.max() <= 1.0
        assert not np.allclose(out, np.asarray(imgs))

    def test_gaussian_blur_preserves_mass(self):
        imgs = jnp.zeros((1, 33, 33)).at[0, 16, 16].set(1.0)
        out = np.asarray(gaussian_blur(imgs, 1.5))
        assert out.sum() == pytest.approx(1.0, rel=1e-3)
        assert out[0, 16, 16] < 1.0


class TestPrepareBatch:
    def test_warped_pair_consistency(self):
        """Points warped by H_pair must land on the warped image's label
        peaks — the core geometric contract of the pipeline."""
        from ssp.core.homography import warp_points

        rng = np.random.default_rng(0)
        B, H, W = 2, 64, 96
        images = jnp.asarray(rng.uniform(size=(B, H, W)).astype(np.float32))
        pts = jnp.asarray(rng.uniform(10, 50, (B, 5, 2)).astype(np.float32))
        valid = jnp.ones((B, 5), bool)
        batch = prepare_batch(
            jax.random.key(3), images, pts, valid,
            warped_pair={"enable": True, "params": {"allow_artifacts": False,
                                                    "patch_ratio": 0.7}},
        )
        # normalized warp of the original points by H_pair
        scale = jnp.array([(W - 1) / 2.0, (H - 1) / 2.0])
        pn = pts / scale - 1.0
        warped_n = jax.vmap(warp_points)(pn, batch["H_pair"])
        warped_pix = np.asarray((warped_n + 1.0) * scale)
        wl = np.asarray(batch["warped_labels_2d"][..., 0])
        for b in range(B):
            for x, y in warped_pix[b]:
                if 1 <= x < W - 1 and 1 <= y < H - 1:
                    yi, xi = int(round(y)), int(round(x))
                    assert wl[b, max(yi-1,0):yi+2, max(xi-1,0):xi+2].max() == 1.0

    def test_tpu_twopass_branch_matches_gather(self, monkeypatch):
        """On TPU backends _warp_sample routes the image resample through
        the gather-free two-pass warp; its output must agree with the
        gather path CI actually runs.  Monkeypatch the backend probe,
        and pin the resampler to its XLA fallback (the Mosaic kernel
        needs TPU hardware; on TPU the canvas is also rounded to a
        128-multiple, which this still exercises)."""
        import ssp.data.pipeline as pl
        import ssp.kernels.warp_twopass as wt

        monkeypatch.setattr(wt, "_use_pallas", lambda size: False)

        rng = np.random.default_rng(7)
        B, H, W = 2, 100, 150
        images = jnp.asarray(rng.uniform(size=(B, H, W)).astype(np.float32))
        pts = jnp.asarray(rng.uniform(20, 80, (B, 4, 2)).astype(np.float32))
        valid = jnp.ones((B, 4), bool)
        pair_cfg = {"enable": True, "params": {"allow_artifacts": False,
                                               "patch_ratio": 0.7}}

        ref = pl.prepare_batch(jax.random.key(9), images, pts, valid,
                               warped_pair=pair_cfg)
        monkeypatch.setattr(pl.jax, "default_backend", lambda: "tpu")
        got = pl.prepare_batch(jax.random.key(9), images, pts, valid,
                               warped_pair=pair_cfg)
        # identical homography draws (same key), so only the resampler
        # differs: two-pass ≈ direct bilinear to sub-pixel detail
        np.testing.assert_allclose(
            np.asarray(got["H_pair"]), np.asarray(ref["H_pair"]), atol=1e-6
        )
        a = np.asarray(got["warped_image"][..., 0])
        b = np.asarray(ref["warped_image"][..., 0])
        # agreement in the interior (borders differ by pad handling)
        diff = np.abs(a - b)[:, 8:-8, 8:-8]
        assert np.mean(diff) < 5e-3 and np.percentile(diff, 99) < 5e-2

    def test_pair_built_from_clean_content(self, monkeypatch):
        """The warped pair must warp the *un-augmented* image and apply
        photometric independently (reference 'warp original image',
        datasets/Coco.py:396-404) — not re-warp the augmented base."""
        import ssp.data.pipeline as pl
        from ssp.core.warp import inv_warp_image

        # marker augmentation: one flat +0.25.  If the pair were built
        # from the augmented base, the warped image would carry +0.5 in
        # the interior (base marker warped in + its own marker).
        def marker_photo(key, imgs, primitives=None, params=None):
            return imgs + 0.25

        monkeypatch.setattr(pl, "photometric_augment", marker_photo)
        rng = np.random.default_rng(1)
        B, H, W = 1, 48, 64
        images = jnp.asarray(rng.uniform(0.0, 0.5, (B, H, W)).astype(np.float32))
        pts = jnp.asarray(rng.uniform(10, 40, (B, 4, 2)).astype(np.float32))
        valid = jnp.ones((B, 4), bool)
        batch = pl.prepare_batch(
            jax.random.key(5), images, pts, valid,
            photometric={"enable": True},
            warped_pair={"enable": True,
                         "params": {"allow_artifacts": False, "patch_ratio": 0.8}},
        )
        # base image carries exactly one marker
        np.testing.assert_allclose(
            np.asarray(batch["image"][..., 0]), np.asarray(images) + 0.25,
            atol=1e-6,
        )
        # pair = warp(clean) + one marker
        expected = np.asarray(
            inv_warp_image(images[0][..., None], batch["H_pair_inv"][0])
        )[..., 0] + 0.25
        got = np.asarray(batch["warped_image"][0, ..., 0])
        interior = np.asarray(batch["warped_valid_mask"][0]) > 0
        # erode the comparison region: warp interpolation at the border
        interior[:2] = interior[-2:] = False
        interior[:, :2] = interior[:, -2:] = False
        np.testing.assert_allclose(got[interior], expected[interior], atol=1e-3)

    def test_residual_maps(self):
        """labels_res / warped_res carry the fractional offsets the
        reference keeps (datasets/data_tools.py:58-60)."""
        from ssp.data.pipeline import splat_residuals

        pts = jnp.array([[3.4, 5.6], [10.0, 2.25]])
        valid = jnp.array([True, True])
        res = np.asarray(splat_residuals(pts, valid, (16, 16)))
        # round(3.4)=3, round(5.6)=6 → residual (0.4, -0.4)
        np.testing.assert_allclose(res[6, 3], [3.4 - 3.0, 5.6 - 6.0], atol=1e-5)
        np.testing.assert_allclose(res[2, 10], [0.0, 0.25], atol=1e-5)
        assert np.abs(res).max() <= 0.5 + 1e-6

        rng = np.random.default_rng(2)
        B, H, W = 1, 48, 64
        images = jnp.asarray(rng.uniform(size=(B, H, W)).astype(np.float32))
        p = jnp.asarray(rng.uniform(10, 40, (B, 6, 2)).astype(np.float32))
        v = jnp.ones((B, 6), bool)
        batch = prepare_batch(
            jax.random.key(1), images, p, v,
            warped_pair={"enable": True, "params": {"allow_artifacts": False}},
        )
        assert batch["labels_res"].shape == (B, H, W, 2)
        assert batch["warped_res"].shape == (B, H, W, 2)
        # warped points are almost surely fractional → nonzero residuals
        assert np.abs(np.asarray(batch["warped_res"])).sum() > 0
        # residual positions coincide with label positions
        lbl = np.asarray(batch["warped_labels_2d"][0, ..., 0])
        wres = np.abs(np.asarray(batch["warped_res"][0])).sum(-1)
        assert (wres[lbl == 0] == 0).all()

    def test_semantic_warp_ignore_nearest(self):
        B, H, W = 1, 32, 32
        images = jnp.ones((B, H, W)) * 0.5
        pts = jnp.zeros((B, 1, 2))
        valid = jnp.zeros((B, 1), bool)
        sem = jnp.ones((B, H, W), jnp.int32) * 7
        batch = prepare_batch(
            jax.random.key(0), images, pts, valid, sem=sem,
            warped_pair={"enable": True, "params": {"allow_artifacts": True}},
            sem_warp_mode="nearest",
        )
        ws = np.asarray(batch["warped_sem"])
        assert set(np.unique(ws)) <= {7, 133}
        # out-of-frame regions must be the ignore class exactly where the
        # valid mask is 0
        mask = np.asarray(batch["warped_valid_mask"][0])
        assert (ws[0][mask == 0] == 133).all()

    def test_semantic_warp_bilinear_reference_semantics(self):
        """Default mode matches the reference: class ids interpolated as
        floats then truncated (Coco_sem.py:406-409) — so values lie in
        [0, id] with boundary blending, ignore fill outside the mask."""
        B, H, W = 1, 32, 32
        images = jnp.ones((B, H, W)) * 0.5
        pts = jnp.zeros((B, 1, 2))
        valid = jnp.zeros((B, 1), bool)
        sem = jnp.ones((B, H, W), jnp.int32) * 7
        batch = prepare_batch(
            jax.random.key(0), images, pts, valid, sem=sem,
            warped_pair={"enable": True, "params": {"allow_artifacts": True}},
        )
        ws = np.asarray(batch["warped_sem"])
        mask = np.asarray(batch["warped_valid_mask"][0])
        assert (ws[0][mask == 0] == 133).all()
        inside = ws[0][mask > 0]
        assert inside.min() >= 0 and inside.max() <= 7
        # the interior is still the exact class (blending is a border
        # effect of the zero padding)
        assert (inside == 7).mean() > 0.9


class TestHomographicBranch:
    def test_labels_follow_warped_image(self):
        """The magicpoint-config path: homographic augmentation must move
        image content and labels together (reference
        SyntheticDataset_gaussian.py:423-476)."""
        from ssp.core.homography import warp_points

        rng = np.random.default_rng(4)
        B, H, W = 2, 64, 96
        images = jnp.asarray(rng.uniform(size=(B, H, W)).astype(np.float32))
        pts = jnp.asarray(rng.uniform(15, 45, (B, 5, 2)).astype(np.float32))
        valid = jnp.ones((B, 5), bool)
        batch = prepare_batch(
            jax.random.key(11), images, pts, valid,
            homographic={"enable": True, "valid_border_margin": 2,
                         "params": {"allow_artifacts": False, "patch_ratio": 0.7}},
        )
        # returned points are the warped ones; labels must splat there
        lbl = np.asarray(batch["labels_2d"][..., 0])
        p = np.asarray(batch["points"])
        v = np.asarray(batch["points_valid"])
        for b in range(B):
            for (x, y), ok in zip(p[b], v[b]):
                if ok and 1 <= x < W - 1 and 1 <= y < H - 1:
                    yi, xi = int(round(y)), int(round(x))
                    assert lbl[b, yi, xi] == 1.0
        # valid mask shrinks from the border margin, never empty
        m = np.asarray(batch["valid_mask"])
        assert 0 < m.mean() <= 1.0
        # out-of-frame warped points are invalidated
        pts_far = jnp.asarray(rng.uniform(0, 3, (B, 5, 2)).astype(np.float32))
        b2 = prepare_batch(
            jax.random.key(12), images, pts_far, valid,
            homographic={"enable": True,
                         "params": {"allow_artifacts": True,
                                    "translation_overflow": 0.3}},
        )
        p2, v2 = np.asarray(b2["points"]), np.asarray(b2["points_valid"])
        oob = (p2[..., 0] < 0) | (p2[..., 0] > W - 1) | (p2[..., 1] < 0) | (p2[..., 1] > H - 1)
        assert not (oob & v2).any()


class TestPhotometricDistributions:
    def test_brightness_bounded(self):
        from ssp.data.photometric import random_brightness

        imgs = jnp.full((8, 16, 16), 0.5)
        out = np.asarray(random_brightness(jax.random.key(0), imgs, max_abs_change=50))
        deltas = out.reshape(8, -1) - 0.5
        # per-image constant shift within ±50/255
        assert np.allclose(deltas.std(axis=1), 0, atol=1e-6)
        assert np.abs(deltas).max() <= 50 / 255 + 1e-6
        assert np.abs(deltas.mean(axis=1)).max() > 0.01  # actually random

    def test_contrast_scales_around_mean(self):
        from ssp.data.photometric import random_contrast

        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.uniform(0.3, 0.7, (4, 16, 16)).astype(np.float32))
        out = np.asarray(random_contrast(jax.random.key(1), imgs,
                                         strength_range=(0.5, 1.5)))
        means = np.asarray(imgs).mean(axis=(1, 2))
        np.testing.assert_allclose(out.mean(axis=(1, 2)), means, atol=1e-3)

    def test_speckle_sets_extremes(self):
        from ssp.data.photometric import additive_speckle_noise

        imgs = jnp.full((2, 64, 64), 0.5)
        out = np.asarray(additive_speckle_noise(
            jax.random.key(2), imgs, prob_range=(0.05, 0.05)))
        frac_extreme = ((out == 0) | (out == 1)).mean()
        assert 0.05 < frac_extreme < 0.15  # ≈ 2 × 5%


class TestTruncate:
    def test_truncate_fraction(self, tmp_path):
        full = SyntheticShapesDataset(
            task="train", primitives=["draw_polygon"],
            generation={"split_sizes": {"training": 10}},
            cache_dir=tmp_path, preprocessing={"resize": [32, 48]},
        )
        half = SyntheticShapesDataset(
            task="train", primitives=["draw_polygon"],
            truncate={"draw_polygon": 0.5},
            generation={"split_sizes": {"training": 10}},
            cache_dir=tmp_path, preprocessing={"resize": [32, 48]},
        )
        assert len(full) == 10 and len(half) == 5
        np.testing.assert_array_equal(half._images, full._images[:5])
