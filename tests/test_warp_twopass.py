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


class TestCoefKernel:
    """In-kernel coordinate computation (``vresample_coef_pallas``) vs
    the rows-array kernel fed the same coordinates (same hat-function
    resample, coordinates rebuilt from ``_pass_coefs``' 20 scalars)."""

    def _setup(self, seed, S=128):
        rng = np.random.default_rng(seed)
        img = rng.uniform(size=(S, S)).astype(np.float32)
        Hm = (np.eye(3) + rng.normal(0, 0.1, (3, 3))).astype(np.float32)
        return rng, jnp.asarray(img), jnp.asarray(Hm), S

    def test_pass1_matches_rows_kernel(self):
        from ssp.kernels.vresample_pallas import (
            vresample_coef_pallas, vresample_pallas)
        from ssp.kernels.warp_twopass import _pass_coefs

        _, img, Hm, S = self._setup(0)
        rlo, rhi, clo, chi = 0.0, 100.0, 10.0, 120.0
        c1, _ = _pass_coefs(Hm, rlo, rhi, clo, chi, S)
        lin = jnp.linspace(-1.0, 1.0, S)
        to_pix = (S - 1) / 2.0
        a, b, c = Hm[0]
        d, e, f = Hm[1]
        g, h, i = Hm[2]
        xp, yo = lin[None, :], lin[:, None]
        denom = xp * g - a
        denom = jnp.where(jnp.abs(denom) < 1e-8, 1e-8, denom)
        x_src = (b * yo + c - xp * (h * yo + i)) / denom
        wsrc = g * x_src + h * yo + i
        v1 = (d * x_src + e * yo + f) / jnp.where(
            jnp.abs(wsrc) < 1e-8, 1e-8, wsrc)
        rows = (v1 + 1.0) * to_pix
        rows = jnp.where(jnp.abs(x_src) <= 1.5, rows, -10.0)
        ar = jnp.arange(S)
        rows = jnp.where(((ar >= rlo) & (ar < rhi))[:, None], rows, -10.0)
        ref = vresample_pallas(img, rows, interpret=True)
        got = vresample_coef_pallas(img, c1, interpret=True)
        # fp32 coordinate-algebra reassociation: ~1e-5 px -> ~1e-4 value
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)

    def test_full_warp_matches_einsum_path(self):
        """Forced coef path (interpret) vs the XLA einsum fallback over
        rotation buckets; tolerance covers the fallback's bf16 weights."""
        from ssp.core.homography import inv3
        from ssp.kernels import warp_twopass as wt

        rng = np.random.default_rng(2)
        H_px, W_px = 96, 128
        img = jnp.asarray(rng.uniform(size=(H_px, W_px)).astype(np.float32))
        for ang in (-170.0, -95.0, 10.0, 80.0):
            a_r = np.radians(ang)
            ca, sa = np.cos(a_r), np.sin(a_r)
            Hm = np.array(
                [[ca, -sa, 0], [sa, ca, 0], [0, 0, 1.0]], np.float32)
            Hm[:2, 2] = rng.uniform(-0.2, 0.2, 2)
            Hm[2, :2] = rng.uniform(-0.05, 0.05, 2)
            Hm = jnp.asarray(Hm)
            S = max(H_px, W_px)
            sx = (S - 1) / (W_px - 1)
            sy = (S - 1) / (H_px - 1)
            T = jnp.array([[sx, 0.0, sx - 1.0], [0.0, sy, sy - 1.0],
                           [0.0, 0.0, 1.0]])
            Hc = inv3(T) @ Hm @ T
            canvas = jnp.pad(
                img[..., None], ((0, S - H_px), (0, S - W_px), (0, 0)))
            k = wt._mean_rotation_bucket(Hc)
            rk_inv = jnp.stack([wt._rot_k((4 - kk) % 4) for kk in range(4)])
            Hres = Hc @ rk_inv[k]
            rlo = jnp.array([0, 0, S - H_px, S - W_px])[k]
            rhi = jnp.array([H_px, W_px, S, S])[k]
            clo = jnp.array([0, S - H_px, S - W_px, 0])[k]
            chi = jnp.array([W_px, S, S, H_px])[k]
            mid = wt._twopass_square_coef(
                canvas[..., 0], Hres, rlo, rhi, clo, chi, interpret=True
            )[..., None]
            out = jax.lax.switch(
                k,
                [lambda m, kk=kk: jnp.rot90(m, k=kk, axes=(0, 1))
                 for kk in range(4)],
                mid,
            )[:H_px, :W_px, 0]
            ref = wt.inv_warp_image_twopass(img, Hm)  # CPU: einsum path
            d = np.abs(np.asarray(ref) - np.asarray(out))
            assert d.max() < 1.5e-2 and d.mean() < 2e-3, (ang, d.max(), d.mean())

    def test_vmap_batches_coef_kernel(self):
        from ssp.kernels.vresample_pallas import vresample_coef_pallas
        from ssp.kernels.warp_twopass import _pass_coefs

        rng = np.random.default_rng(3)
        S, N = 128, 3
        img = jnp.asarray(rng.uniform(size=(S, S)).astype(np.float32))
        Hms = jnp.asarray(
            np.eye(3) + rng.normal(0, 0.08, (N, 3, 3)).astype(np.float32))
        coefs = jax.vmap(
            lambda Hm: _pass_coefs(Hm, 0.0, float(S), 0.0, float(S), S)[0]
        )(Hms)
        got = np.asarray(jax.vmap(
            lambda cc: vresample_coef_pallas(img, cc, interpret=True)
        )(coefs))
        for n in range(N):
            one = np.asarray(
                vresample_coef_pallas(img, coefs[n], interpret=True))
            np.testing.assert_allclose(got[n], one, atol=1e-6)
