"""Two-pass warp vs the gather-based reference implementation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssp.core.homography import sample_homography
from ssp.core.warp import inv_warp_image
from ssp.kernels.warp_twopass import inv_warp_image_twopass


def _smooth(shape, seed):
    import cv2

    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, shape).astype(np.float32)
    return cv2.GaussianBlur(img, (7, 7), 0)


def _compare(img, Hm, atol_mean=0.01):
    want = np.asarray(inv_warp_image(jnp.asarray(img)[..., None], jnp.asarray(Hm)))[..., 0]
    got = np.asarray(inv_warp_image_twopass(jnp.asarray(img), jnp.asarray(Hm)))
    # interiors only: half-pixel edge handling differs harmlessly
    w = np.abs(want[4:-4, 4:-4])
    g = np.abs(got[4:-4, 4:-4])
    diff = np.abs(want - got)[4:-4, 4:-4]
    return diff.mean(), np.abs(want).mean()


class TestTwoPassWarp:
    def test_identity(self):
        img = _smooth((48, 64), 0)
        got = np.asarray(inv_warp_image_twopass(jnp.asarray(img), jnp.eye(3)))
        # resample arithmetic runs in bf16 (≈0.4% rel) — the consumers
        # (bf16 conv stack, heatmap averaging) don't resolve finer
        np.testing.assert_allclose(got, img, atol=6e-3)

    def test_translation(self):
        img = _smooth((48, 64), 1)
        Hm = np.eye(3)
        Hm[0, 2] = 0.1
        Hm[1, 2] = -0.07
        mean_diff, scale = _compare(img, Hm)
        assert mean_diff < 0.01 * max(scale, 0.1)

    @pytest.mark.parametrize("angle", [0.2, 0.7, 1.2, 1.57, 2.3, 3.1, -0.9, -1.57, -2.8])
    def test_rotations_all_quadrants(self, angle):
        img = _smooth((64, 64), 2)
        c, s = np.cos(angle), np.sin(angle)
        Hm = np.array([[c, -s, 0.02], [s, c, -0.03], [0.0, 0.0, 1.0]])
        mean_diff, scale = _compare(img, Hm)
        assert mean_diff < 0.02 * max(scale, 0.1), f"angle={angle}: {mean_diff}"

    def test_random_sampled_homographies(self):
        img = _smooth((48, 64), 3)
        worst = 0.0
        for i in range(12):
            Hm = np.asarray(
                sample_homography(
                    jax.random.key(i), allow_artifacts=True,
                    patch_ratio=0.85, scaling_amplitude=0.2,
                    perspective_amplitude_x=0.2, perspective_amplitude_y=0.2,
                )
            )
            mean_diff, scale = _compare(img, Hm)
            worst = max(worst, mean_diff / max(scale, 0.1))
        assert worst < 0.05, worst

    def test_multichannel(self):
        img = np.stack([_smooth((48, 64), 4), _smooth((48, 64), 5)], axis=-1)
        Hm = np.eye(3)
        Hm[0, 2] = 0.05
        want = np.asarray(inv_warp_image(jnp.asarray(img), jnp.asarray(Hm)))
        got = np.asarray(inv_warp_image_twopass(jnp.asarray(img), jnp.asarray(Hm)))
        assert got.shape == want.shape
        assert np.abs(got - want)[4:-4, 4:-4].mean() < 0.01


class TestVresamplePallas:
    def test_matches_hat_reference_interpret(self):
        """Interpret-mode kernel vs a direct fp32 hat-weight reference:
        out[o,x] = sum_i max(0, 1-|rows[o,x]-i|) . img[i,x]."""
        from ssp.kernels.vresample_pallas import vresample_pallas

        rng = np.random.default_rng(0)
        S = 32
        img = rng.uniform(size=(S, S)).astype(np.float32)
        rows = rng.uniform(-2, S + 1, size=(S, S)).astype(np.float32)
        got = np.asarray(
            vresample_pallas(jnp.asarray(img), jnp.asarray(rows), interpret=True)
        )
        ii = np.arange(S)[:, None, None]
        w = np.maximum(0.0, 1.0 - np.abs(rows[None] - ii))
        want = np.einsum("iox,ix->ox", w, img)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_bottom_edge_no_double_count_small_image(self):
        """S=20 (not a multiple of UNROLL=8): the unrolled band loop
        overshoots past the last row — the overshot taps' weights must
        be zeroed, not clamped onto the last row (which double-counted
        it for coordinates near the bottom edge)."""
        from ssp.kernels.vresample_pallas import vresample_pallas

        S = 20
        img = np.zeros((S, S), np.float32)
        img[S - 1] = 1.0
        rows = np.full((S, S), S - 1.5, np.float32)  # 0.5 weight on the last row
        got = np.asarray(
            vresample_pallas(jnp.asarray(img), jnp.asarray(rows), interpret=True)
        )
        np.testing.assert_allclose(got, np.full((S, S), 0.5), atol=1e-6)

    def test_vmap_adds_batch(self):
        from ssp.kernels.vresample_pallas import vresample_pallas

        rng = np.random.default_rng(1)
        S, N = 16, 3
        imgs = rng.uniform(size=(N, S, S)).astype(np.float32)
        rows = rng.uniform(0, S - 1, size=(N, S, S)).astype(np.float32)
        got = np.asarray(jax.vmap(
            lambda a, b: vresample_pallas(a, b, interpret=True)
        )(jnp.asarray(imgs), jnp.asarray(rows)))
        for n in range(N):
            one = np.asarray(vresample_pallas(
                jnp.asarray(imgs[n]), jnp.asarray(rows[n]), interpret=True
            ))
            np.testing.assert_allclose(got[n], one, atol=1e-6)
