"""Core geometry: homography sampling/solve, point & image warps, masks.

Oracles are independent host-side implementations (cv2 / scipy), not the
reference code — we test behavioural contracts, not line parity.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import map_coordinates

from ssp.core import (
    bilinear_sample,
    compute_valid_mask,
    flatten_detection,
    depth_to_space,
    homography_from_corners,
    inv_warp_image,
    labels_to_cells,
    sample_homographies,
    sample_homography,
    scale_homography,
    space_to_depth,
    warp_points,
)


class TestHomographySolve:
    def test_matches_cv2_getperspectivetransform(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            pts1 = np.float32([[0, 0], [0, 1], [1, 1], [1, 0]])
            pts2 = pts1 + rng.uniform(-0.2, 0.2, (4, 2)).astype(np.float32)
            want = cv2.getPerspectiveTransform(pts1, pts2)
            got = homography_from_corners(jnp.asarray(pts1), jnp.asarray(pts2))
            np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_maps_corners(self):
        pts1 = jnp.float32([[-1, -1], [-1, 1], [1, 1], [1, -1]])
        pts2 = pts1 * 0.5 + 0.1
        H = homography_from_corners(pts1, pts2)
        np.testing.assert_allclose(np.asarray(warp_points(pts1, H)), np.asarray(pts2), atol=5e-4)


class TestWarpPoints:
    def test_identity(self):
        pts = jnp.array([[3.0, 4.0], [0.0, 0.0]])
        out = warp_points(pts, jnp.eye(3))
        np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-6)

    def test_batched_matches_numpy(self):
        rng = np.random.default_rng(1)
        Hs = np.tile(np.eye(3), (4, 1, 1))
        Hs[:, :2, 2] = rng.normal(size=(4, 2))
        Hs[:, 2, :2] = rng.normal(scale=0.01, size=(4, 2))
        pts = rng.uniform(-1, 1, (7, 2))
        got = np.asarray(warp_points(jnp.asarray(pts), jnp.asarray(Hs)))
        for b in range(4):
            ph = np.concatenate([pts, np.ones((7, 1))], -1) @ Hs[b].T
            want = ph[:, :2] / ph[:, 2:]
            np.testing.assert_allclose(got[b], want, atol=1e-5)


class TestSampleHomography:
    def test_identityish_when_all_disabled(self):
        H = sample_homography(
            jax.random.key(0),
            perspective=False,
            scaling=False,
            rotation=False,
            translation=False,
            patch_ratio=1.0,
        )
        np.testing.assert_allclose(np.asarray(H), np.eye(3), atol=1e-5)

    def test_corners_contained_when_no_artifacts(self):
        # without artifacts, the warped output square must land inside the
        # input square — the sampler's core invariant (rejection semantics)
        corners = jnp.float32([[-1, -1], [-1, 1], [1, 1], [1, -1]])
        Hs = sample_homographies(
            jax.random.key(42),
            64,
            patch_ratio=0.5,
            allow_artifacts=False,
            scaling_amplitude=0.1,
            perspective_amplitude_x=0.1,
            perspective_amplitude_y=0.1,
        )
        warped = np.asarray(warp_points(corners, Hs))
        assert (warped >= -1 - 1e-4).all() and (warped <= 1 + 1e-4).all()

    def test_randomness_and_spread(self):
        Hs = np.asarray(sample_homographies(jax.random.key(7), 32, allow_artifacts=True))
        assert np.std(Hs[:, 0, 2]) > 1e-3  # translations vary
        assert not np.allclose(Hs[0], Hs[1])

    def test_scale_homography_roundtrip(self):
        # scale_homography conjugates with T: x_norm = (2/W)·x_pix - 1
        # (the reference's convention, utils/homographies.py:270-276)
        H = np.asarray(sample_homography(jax.random.key(3)))
        Hp = scale_homography(jnp.asarray(H), (240, 320))
        pts_n = np.array([[0.3, -0.2], [-0.5, 0.5]])
        pts_p = (pts_n + 1) * np.array([320, 240]) / 2
        out_n = np.asarray(warp_points(jnp.asarray(pts_n), jnp.asarray(H)))
        out_p = np.asarray(warp_points(jnp.asarray(pts_p), Hp))
        back = out_p / (np.array([320, 240]) / 2) - 1
        np.testing.assert_allclose(back, out_n, atol=1e-4)


class TestImageWarp:
    def test_bilinear_matches_map_coordinates_interior(self):
        rng = np.random.default_rng(2)
        img = rng.uniform(size=(24, 32, 1)).astype(np.float32)
        coords = rng.uniform(2, 20, (50, 2)).astype(np.float32)  # interior
        got = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))[:, 0]
        want = map_coordinates(img[..., 0], [coords[:, 1], coords[:, 0]], order=1)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_out_of_bounds_is_zero(self):
        img = jnp.ones((8, 8, 1))
        coords = jnp.array([[-5.0, -5.0], [100.0, 3.0]])
        out = np.asarray(bilinear_sample(img, coords))
        np.testing.assert_allclose(out, 0.0)

    def test_identity_warp_preserves_image(self):
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.uniform(size=(16, 24, 1)).astype(np.float32))
        out = inv_warp_image(img, jnp.eye(3))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)

    def test_translation_warp(self):
        # H_inv translating +dx in normalized coords shifts content left
        img = np.zeros((16, 16, 1), np.float32)
        img[8, 8, 0] = 1.0
        dx_pix = 2
        dx_norm = 2 * dx_pix / (16 - 1)
        H_inv = np.eye(3)
        H_inv[0, 2] = dx_norm
        out = np.asarray(inv_warp_image(jnp.asarray(img), jnp.asarray(H_inv)))
        assert out[8, 6, 0] == pytest.approx(1.0, abs=1e-5)

    def test_valid_mask_shrinks_and_erodes(self):
        H_inv = np.eye(3)
        H_inv[0, 2] = 0.5  # half the image maps outside
        m0 = np.asarray(compute_valid_mask((32, 32), jnp.asarray(H_inv)))
        assert 0.3 < m0.mean() < 0.9
        m1 = np.asarray(compute_valid_mask((32, 32), jnp.asarray(H_inv), erosion_radius=3))
        assert m1.sum() < m0.sum()
        assert set(np.unique(m1)) <= {0.0, 1.0}

    def test_valid_mask_erosion_matches_cv2_oracle(self):
        """Pixel-exact agreement with the reference semantics: warp an
        all-ones image (nearest) by H_inv, erode with cv2 MORPH_ELLIPSE
        (default border) — utils/utils.py:715-742 — across random
        strong-perspective homographies and radii."""
        import cv2

        from ssp.core.homography import sample_homography

        shape = (48, 64)
        params = dict(
            perspective_amplitude_x=0.3, perspective_amplitude_y=0.3,
            scaling_amplitude=0.4, patch_ratio=0.7, allow_artifacts=True,
        )
        for seed in range(8):
            Hm = sample_homography(jax.random.key(seed), shift=-1.0, **params)
            for radius in (0, 2, 3):
                got = np.asarray(
                    compute_valid_mask(shape, Hm, erosion_radius=radius)
                )
                ones = jnp.ones((*shape, 1))
                warped = np.asarray(
                    inv_warp_image(ones, Hm, mode="nearest")
                )[..., 0].astype(np.float32)
                if radius > 0:
                    k = cv2.getStructuringElement(
                        cv2.MORPH_ELLIPSE, (radius * 2, radius * 2)
                    )
                    warped = cv2.erode(warped, k, iterations=1)
                mismatch = np.abs(got - warped).sum()
                # allow a measure-zero boundary disagreement (float
                # rounding of the in-bounds test vs nearest gather)
                assert mismatch <= 0.001 * got.size, (
                    f"seed {seed} radius {radius}: {mismatch} px differ"
                )


class TestGridOps:
    def test_flatten_detection_64ch_no_dustbin(self):
        """A 64-channel head goes through depth-to-space raw, no softmax
        (reference flatten_64to1 dispatch, Val_model_heatmap.py:135-139)."""
        from ssp.core.grid import depth_to_space, flatten_detection

        rng = np.random.default_rng(7)
        semi = jnp.asarray(rng.normal(size=(1, 3, 4, 64)).astype(np.float32))
        out = flatten_detection(semi)
        assert out.shape == (1, 24, 32, 1)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(depth_to_space(semi, 8))
        )

    def test_space_depth_roundtrip(self):
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.uniform(size=(2, 16, 24, 3)).astype(np.float32))
        y = space_to_depth(x, 8)
        assert y.shape == (2, 2, 3, 3 * 64)
        np.testing.assert_allclose(np.asarray(depth_to_space(y, 8)), np.asarray(x))

    def test_channel_semantics(self):
        # pixel (dy, dx) inside a cell lands in channel dy*8+dx (C=1)
        x = np.zeros((1, 8, 8, 1), np.float32)
        x[0, 3, 5, 0] = 1.0
        y = np.asarray(space_to_depth(jnp.asarray(x), 8))
        assert y[0, 0, 0, 3 * 8 + 5] == 1.0
        assert y.sum() == 1.0

    def test_labels_to_cells_dustbin(self):
        labels = np.zeros((1, 16, 16, 1), np.float32)
        labels[0, 2, 3, 0] = 1.0  # one keypoint in cell (0,0)
        labels[0, 1, 1, 0] = 1.0  # second keypoint, same cell
        cells = np.asarray(labels_to_cells(jnp.asarray(labels)))
        assert cells.shape == (1, 2, 2, 65)
        np.testing.assert_allclose(cells.sum(-1), 1.0, atol=1e-6)  # normalized
        assert cells[0, 0, 0, 64] == 0.0  # dustbin off where kpts exist
        assert cells[0, 1, 1, 64] == 1.0  # dustbin on in empty cell
        assert cells[0, 0, 0, 2 * 8 + 3] == pytest.approx(0.5)  # 2 kpts → 1/2

    def test_flatten_detection_inverts_labels(self):
        # strong logits at the label channels → heatmap peaks at label pixels
        labels = np.zeros((1, 16, 16, 1), np.float32)
        labels[0, 5, 9, 0] = 1.0
        cells = np.asarray(labels_to_cells(jnp.asarray(labels)))
        logits = jnp.asarray(np.log(cells + 1e-9) * 1.0 + 20 * cells)
        heat = np.asarray(flatten_detection(logits))
        assert heat.shape == (1, 16, 16, 1)
        assert np.unravel_index(heat[0, ..., 0].argmax(), (16, 16)) == (5, 9)
