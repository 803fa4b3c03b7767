"""Post-processing: NMS vs greedy oracle, keypoint extraction, matching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssp.postprocess import (
    PointTracker,
    extract_keypoints,
    nn_match_two_way,
    sample_descriptors,
    simple_nms,
    soft_argmax_refine,
)


def greedy_nms_oracle(heat: np.ndarray, radius: int) -> np.ndarray:
    """Independent reimplementation of greedy box suppression: visit
    points by descending score; keep if no stronger kept point within
    chebyshev distance <= radius."""
    H, W = heat.shape
    out = np.zeros_like(heat)
    order = np.argsort(-heat, axis=None)
    suppressed = np.zeros_like(heat, bool)
    for idx in order:
        y, x = divmod(idx, W)
        if heat[y, x] <= 0:
            break
        if suppressed[y, x]:
            continue
        out[y, x] = heat[y, x]
        y0, y1 = max(0, y - radius), min(H, y + radius + 1)
        x0, x1 = max(0, x - radius), min(W, x + radius + 1)
        suppressed[y0:y1, x0:x1] = True
    return out


class TestSimpleNMS:
    def test_sparse_points_exact(self):
        # well-separated peaks survive exactly
        heat = np.zeros((64, 64), np.float32)
        peaks = [(10, 10, 0.9), (40, 40, 0.8), (10, 50, 0.7)]
        for y, x, v in peaks:
            heat[y, x] = v
        out = np.asarray(simple_nms(jnp.asarray(heat), radius=4))
        np.testing.assert_allclose(out, heat)

    def test_close_points_suppressed(self):
        heat = np.zeros((32, 32), np.float32)
        heat[10, 10] = 0.9
        heat[10, 12] = 0.8  # within radius 4 of the stronger point
        out = np.asarray(simple_nms(jnp.asarray(heat), radius=4))
        assert out[10, 10] == pytest.approx(0.9)
        assert out[10, 12] == 0.0

    def test_vs_greedy_oracle_agreement(self):
        # on random dense heatmaps, iterative NMS should agree with the
        # greedy oracle on the overwhelming majority of kept points
        rng = np.random.default_rng(0)
        heat = rng.uniform(size=(48, 64)).astype(np.float32) ** 4
        want = greedy_nms_oracle(heat, 4) > 0
        got = np.asarray(simple_nms(jnp.asarray(heat), radius=4)) > 0
        agree = (want & got).sum()
        assert agree / max(want.sum(), 1) > 0.9

    def test_batched(self):
        heat = np.zeros((2, 16, 16), np.float32)
        heat[0, 5, 5] = 1.0
        heat[1, 8, 8] = 1.0
        out = np.asarray(simple_nms(jnp.asarray(heat), radius=2))
        assert out[0, 5, 5] == 1.0 and out[1, 8, 8] == 1.0


class TestExtractKeypoints:
    def test_basic(self):
        heat = np.zeros((64, 64), np.float32)
        heat[20, 30] = 0.9
        heat[40, 10] = 0.5
        heat[2, 2] = 0.8  # inside the 4-pixel border — must be removed
        pts, valid = extract_keypoints(jnp.asarray(heat), k=10, conf_thresh=0.1)
        pts, valid = np.asarray(pts), np.asarray(valid)
        assert valid.sum() == 2
        assert (pts[0, :2] == [30, 20]).all() and pts[0, 2] == pytest.approx(0.9)
        assert (pts[1, :2] == [10, 40]).all()

    def test_fixed_shapes(self):
        heat = jnp.zeros((32, 32))
        pts, valid = extract_keypoints(heat, k=50, conf_thresh=0.015)
        assert pts.shape == (50, 3) and valid.shape == (50,)
        assert not np.asarray(valid).any()


class TestSampleDescriptors:
    def test_constant_map(self):
        desc = jnp.ones((4, 6, 8)) / np.sqrt(8)
        pts = jnp.array([[5.0, 7.0, 1.0], [20.0, 12.0, 0.5]])
        out = np.asarray(sample_descriptors(desc, pts))
        np.testing.assert_allclose(out, 1 / np.sqrt(8), atol=1e-6)
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-6)

    def test_distinct_cells(self):
        # descriptor at a keypoint deep inside a cell ≈ that cell's vector
        rng = np.random.default_rng(1)
        desc = rng.normal(size=(4, 4, 16)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
        # keypoint at full-res pixel that maps near coarse cell (2, 1):
        # cx = x*(Wc-1)/W = x*3/32 → x=(1)*32/3≈10.7 ; cy = y*3/32 → y=21.3
        pts = jnp.array([[10.67, 21.33, 1.0]])
        out = np.asarray(sample_descriptors(jnp.asarray(desc), pts))
        cos = (out[0] * desc[2, 1]).sum()
        assert cos > 0.95


class TestSoftArgmax:
    def test_centered_peak_zero_offset(self):
        heat = np.zeros((32, 32), np.float32)
        heat[16, 16] = 1.0
        pts = jnp.array([[16.0, 16.0, 1.0]])
        refined = np.asarray(soft_argmax_refine(jnp.asarray(heat), pts))
        np.testing.assert_allclose(refined[0, :2], [16, 16], atol=1e-3)

    def test_offcenter_mass_shifts(self):
        heat = np.zeros((32, 32), np.float32)
        heat[16, 16] = 1.0
        heat[16, 17] = 1.0  # equal mass one pixel right → offset +0.5 in x
        pts = jnp.array([[16.0, 16.0, 1.0]])
        refined = np.asarray(soft_argmax_refine(jnp.asarray(heat), pts))
        assert refined[0, 0] == pytest.approx(16.5, abs=1e-2)
        assert refined[0, 1] == pytest.approx(16.0, abs=1e-2)


class TestMatcher:
    def _rand_desc(self, n, d=32, seed=0):
        rng = np.random.default_rng(seed)
        x = rng.normal(size=(d, n))
        return x / np.linalg.norm(x, axis=0, keepdims=True)

    def test_identity_match(self):
        d = self._rand_desc(10)
        m = nn_match_two_way(d, d, nn_thresh=0.5)
        assert m.shape[1] == 10
        np.testing.assert_array_equal(m[0], m[1])
        np.testing.assert_allclose(m[2], 0.0, atol=1e-6)

    def test_threshold(self):
        d1 = self._rand_desc(5, seed=1)
        d2 = self._rand_desc(5, seed=2)
        m = nn_match_two_way(d1, d2, nn_thresh=1e-6)
        assert m.shape[1] == 0

    def test_mutuality(self):
        # construct: d2 has two near-copies of d1[:,0]; only mutual kept
        d1 = self._rand_desc(3, seed=3)
        d2 = np.concatenate([d1[:, :1] * 0.999 + 1e-3, d1], axis=1)
        d2 /= np.linalg.norm(d2, axis=0, keepdims=True)
        m = nn_match_two_way(d1, d2, nn_thresh=0.5)
        # each d1 column matches its copy in d2 (offset by 1)
        for i1, i2 in zip(m[0], m[1]):
            assert i2 in (i1, i1 + 1)

    def test_tracker_single_frame_matches_contract(self):
        """After one update there is no previous frame: get_matches
        must return the documented [4, L] shape (empty), not the raw
        [3, L] index/dist array."""
        d = self._rand_desc(4, seed=9)
        pts = np.vstack([np.arange(4.0), np.arange(4.0), np.ones(4)])
        tr = PointTracker(max_length=2, nn_thresh=0.7)
        tr.update(pts, d)
        m = tr.get_matches()
        assert m.shape == (4, 0)

    def test_tracker_two_frames(self):
        d = self._rand_desc(6, seed=4)
        pts1 = np.vstack([np.arange(6.0), np.arange(6.0) + 1, np.ones(6)])
        pts2 = pts1.copy()
        pts2[:2] += 2.0
        tr = PointTracker(max_length=2, nn_thresh=0.7)
        tr.update(pts1, d)
        tr.update(pts2, d)
        m = tr.get_matches()
        assert m.shape == (4, 6)
        np.testing.assert_allclose(m[2] - m[0], 2.0)
        tracks = tr.get_tracks(min_length=1)
        assert tracks.shape[0] == 6
