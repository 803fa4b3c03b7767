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


class TestNativeImageIO:
    """libjpeg/libpng decode + C++ INTER_AREA resize vs the cv2 path."""

    def _cv2_ref(self, path, resize):
        import cv2

        img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
        if resize is not None:
            img = cv2.resize(img, (resize[1], resize[0]),
                             interpolation=cv2.INTER_AREA)
        return img.astype(np.float32) / 255.0

    def test_png_parity(self, tmp_path):
        import cv2
        from ssp.native import decode_gray_resize

        rng = np.random.default_rng(0)
        raw = rng.uniform(0, 255, (61, 83)).astype(np.uint8)
        p = tmp_path / "t.png"
        cv2.imwrite(str(p), raw)
        got = decode_gray_resize(p, None)
        if got is None:
            pytest.skip("native imageio unavailable")
        np.testing.assert_allclose(got, raw.astype(np.float32) / 255.0, atol=1e-6)
        # non-integer-ratio INTER_AREA downscale
        got_r = decode_gray_resize(p, (24, 32))
        want_r = self._cv2_ref(p, (24, 32))
        np.testing.assert_allclose(got_r, want_r, atol=2.5 / 255.0)

    def test_jpeg_parity(self, tmp_path):
        import cv2
        from ssp.native import decode_gray_resize

        rng = np.random.default_rng(1)
        raw = cv2.GaussianBlur(
            rng.uniform(0, 255, (60, 90)).astype(np.uint8), (5, 5), 0
        )
        p = tmp_path / "t.jpg"
        cv2.imwrite(str(p), raw)
        got = decode_gray_resize(p, (48, 64))
        if got is None:
            pytest.skip("native imageio unavailable")
        want = self._cv2_ref(p, (48, 64))
        # decoders may differ by a few ulp of the IDCT; resize smooths it
        assert np.abs(got - want).max() < 4.0 / 255.0
        assert np.abs(got - want).mean() < 1.0 / 255.0

    def test_read_gray_native_route_matches(self, tmp_path, monkeypatch):
        import cv2
        from ssp.data.base import read_gray

        rng = np.random.default_rng(2)
        raw = rng.uniform(0, 255, (40, 50)).astype(np.uint8)
        p = tmp_path / "x.png"
        cv2.imwrite(str(p), raw)
        cv2_path = read_gray(p, (32, 40))
        monkeypatch.setenv("SSP_NATIVE_IO", "1")
        native = read_gray(p, (32, 40))
        np.testing.assert_allclose(native, cv2_path, atol=2.5 / 255.0)


class TestWorkerPoolBatches:
    def test_workers_preserve_order(self, tmp_path):
        from ssp.data.synthetic_dataset import SyntheticShapesDataset

        ds = SyntheticShapesDataset(
            task="train", primitives=["draw_polygon"],
            generation={"split_sizes": {"training": 8}},
            cache_dir=tmp_path / "synth", preprocessing={"resize": [32, 48]},
        )
        b0 = next(ds.batches(4, seed=3, workers=0))
        b4 = next(ds.batches(4, seed=3, workers=4))
        for k in b0:
            np.testing.assert_array_equal(b0[k], b4[k])
