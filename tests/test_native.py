"""Native C++ ops: build, parity with python implementations."""

import numpy as np
import pytest

from ssp import native


class TestGreedyNMS:
    def test_matches_python_fallback(self):
        rng = np.random.default_rng(0)
        scores = (rng.uniform(size=(48, 64)) ** 4).astype(np.float32)
        got = native.greedy_nms(scores, dist=4)
        # independent reference: pure-python greedy
        H, W = scores.shape
        keep = np.zeros((H, W), bool)
        suppressed = np.zeros((H, W), bool)
        for i in np.argsort(-scores, axis=None):
            y, x = divmod(int(i), W)
            if scores[y, x] <= 0:
                break
            if suppressed[y, x]:
                continue
            keep[y, x] = True
            suppressed[max(0, y-4):y+5, max(0, x-4):x+5] = True
        np.testing.assert_array_equal(got, keep)

    def test_min_score(self):
        scores = np.zeros((16, 16), np.float32)
        scores[4, 4] = 0.5
        scores[12, 12] = 0.05
        keep = native.greedy_nms(scores, dist=2, min_score=0.1)
        assert keep[4, 4] and not keep[12, 12]


class TestNativeWarp:
    def test_matches_jax_warp(self):
        import jax.numpy as jnp

        from ssp.core.warp import inv_warp_image

        rng = np.random.default_rng(1)
        img = rng.uniform(size=(32, 40)).astype(np.float32)
        H_mat = np.array([[0.95, 0.02, 0.05], [-0.01, 1.01, -0.03], [0.01, 0.0, 1.0]])
        got = native.inv_warp_bilinear(img, H_mat)
        want = np.asarray(inv_warp_image(jnp.asarray(img)[..., None], jnp.asarray(H_mat)))[..., 0]
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestNativeMatcher:
    def test_matches_python_matcher(self):
        from ssp.postprocess.tracker import nn_match_two_way

        rng = np.random.default_rng(2)
        d1 = rng.normal(size=(40, 32)).astype(np.float32)
        d2 = rng.normal(size=(35, 32)).astype(np.float32)
        d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
        d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
        got = native.nn_match_two_way_native(d1, d2, nn_thresh=1.2)
        want = nn_match_two_way(d1.T, d2.T, nn_thresh=1.2)
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])
        np.testing.assert_allclose(got[2], want[2], atol=1e-5)
