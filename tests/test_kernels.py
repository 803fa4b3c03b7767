"""Pallas kernels vs XLA references (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ssp.kernels.nms_pallas import nms_pallas
from ssp.postprocess.nms import simple_nms


class TestNMSPallas:
    def test_matches_xla_nms(self):
        rng = np.random.default_rng(0)
        heat = (rng.uniform(size=(2, 48, 64)) ** 4).astype(np.float32)
        want = np.asarray(simple_nms(jnp.asarray(heat), radius=4, iterations=3))
        got = np.asarray(nms_pallas(jnp.asarray(heat), radius=4, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_single_image(self):
        heat = np.zeros((32, 32), np.float32)
        heat[10, 10] = 0.9
        heat[10, 12] = 0.8
        out = np.asarray(nms_pallas(jnp.asarray(heat), radius=4, interpret=True))
        assert out[10, 10] == 0.9 and out[10, 12] == 0.0

    def test_tiled_path_matches_xla(self):
        # H=256 is a multiple of TILE=128 and >= TILE+2*halo → exercises
        # the halo-DMA tiled kernel
        rng = np.random.default_rng(3)
        heat = (rng.uniform(size=(2, 256, 128)) ** 4).astype(np.float32)
        want = np.asarray(simple_nms(jnp.asarray(heat), radius=4, iterations=3))
        got = np.asarray(nms_pallas(jnp.asarray(heat), radius=4, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_border_no_wraparound(self):
        # circular rolls must not leak suppression across edges
        heat = np.zeros((16, 128), np.float32)
        heat[0, 0] = 0.5
        heat[15, 127] = 0.9  # far corner — wraparound would suppress [0,0]
        out = np.asarray(nms_pallas(jnp.asarray(heat), radius=2, interpret=True))
        assert out[0, 0] == 0.5 and out[15, 127] == 0.9

    def test_fused_border_whole_path(self):
        rng = np.random.default_rng(7)
        heat = (rng.uniform(size=(2, 48, 64)) ** 4).astype(np.float32)
        want = np.array(simple_nms(jnp.asarray(heat), radius=4, iterations=3))
        want[:, :4] = 0; want[:, -4:] = 0; want[:, :, :4] = 0; want[:, :, -4:] = 0
        got = np.asarray(
            nms_pallas(jnp.asarray(heat), radius=4, border=4, interpret=True)
        )
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_fused_border_tiled_path(self):
        # W=320 forces lane padding: the border mask must clip at the
        # true width, not the padded one
        rng = np.random.default_rng(8)
        heat = (rng.uniform(size=(1, 256, 320)) ** 4).astype(np.float32)
        want = np.array(simple_nms(jnp.asarray(heat), radius=4, iterations=3))
        want[:, :4] = 0; want[:, -4:] = 0; want[:, :, :4] = 0; want[:, :, -4:] = 0
        got = np.asarray(
            nms_pallas(jnp.asarray(heat), radius=4, border=4, interpret=True)
        )
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_fused_border_row_padded_tiled_path(self):
        # H=480 row-pads to 512 inside the kernel (bench.py's exact
        # configuration): the border mask must zero the padded rows and
        # clip at the true h_valid=480, not the padded height
        rng = np.random.default_rng(11)
        heat = (rng.uniform(size=(1, 480, 256)) ** 4).astype(np.float32)
        want = np.array(simple_nms(jnp.asarray(heat), radius=4, iterations=3))
        want[:, :4] = 0; want[:, -4:] = 0; want[:, :, :4] = 0; want[:, :, -4:] = 0
        got = np.asarray(
            nms_pallas(jnp.asarray(heat), radius=4, border=4, interpret=True)
        )
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_non_lane_aligned_width(self):
        # W=320 (not a multiple of 128) exercises the lane-padding path
        rng = np.random.default_rng(5)
        heat = (rng.uniform(size=(2, 256, 320)) ** 4).astype(np.float32)
        want = np.asarray(simple_nms(jnp.asarray(heat), radius=4, iterations=3))
        got = np.asarray(nms_pallas(jnp.asarray(heat), radius=4, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestStemPallas:
    """Fused conv1a+BN+relu+conv1b+BN+relu stem kernel vs the XLA path."""

    def _setup(self, B=2, H=32, W=128, seed=0):
        from ssp.kernels.stem_pallas import fold_bn

        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.uniform(size=(B, H, W, 1)).astype(np.float32))
        w1 = jnp.asarray(rng.normal(0, 0.3, (3, 3, 1, 64)).astype(np.float32))
        w2 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 64, 64)).astype(np.float32))
        g1, b1 = jnp.abs(jnp.asarray(rng.normal(1, 0.2, (64,)), jnp.float32)), jnp.asarray(rng.normal(0, 0.2, (64,)), jnp.float32)
        m1, v1 = jnp.asarray(rng.normal(0, 0.2, (64,)), jnp.float32), jnp.abs(jnp.asarray(rng.normal(1, 0.2, (64,)), jnp.float32)) + 0.1
        g2, b2 = jnp.abs(jnp.asarray(rng.normal(1, 0.2, (64,)), jnp.float32)), jnp.asarray(rng.normal(0, 0.2, (64,)), jnp.float32)
        m2, v2 = jnp.asarray(rng.normal(0, 0.2, (64,)), jnp.float32), jnp.abs(jnp.asarray(rng.normal(1, 0.2, (64,)), jnp.float32)) + 0.1
        s1, sb1 = fold_bn(g1, b1, m1, v1)
        s2, sb2 = fold_bn(g2, b2, m2, v2)
        return x, w1, s1, sb1, w2, s2, sb2

    @staticmethod
    def _xla_ref(x, w1, s1, sb1, w2, s2, sb2):
        def conv(xx, w):
            return jax.lax.conv_general_dilated(
                xx, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )

        o1 = jnp.maximum(conv(x.astype(jnp.bfloat16).astype(jnp.float32), w1) * s1 + sb1, 0)
        o1 = o1.astype(jnp.bfloat16).astype(jnp.float32)
        return jnp.maximum(conv(o1, w2) * s2 + sb2, 0)

    def test_parity_vs_xla(self):
        from ssp.kernels.stem_pallas import stem_pallas

        args = self._setup()
        got = np.asarray(stem_pallas(*args, interpret=True), np.float32)
        want = np.asarray(self._xla_ref(*args), np.float32)
        np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)

    def test_borders_are_same_padding(self):
        """Zero 'SAME' padding at all four edges — partial border sums in
        the intermediate activation would show up here."""
        from ssp.kernels.stem_pallas import stem_pallas

        args = self._setup(B=1, H=16, W=128, seed=3)
        got = np.asarray(stem_pallas(*args, interpret=True), np.float32)
        want = np.asarray(self._xla_ref(*args), np.float32)
        edges = np.concatenate([
            got[0, :2].ravel(), got[0, -2:].ravel(),
            got[0, :, :2].ravel(), got[0, :, -2:].ravel(),
        ])
        edges_want = np.concatenate([
            want[0, :2].ravel(), want[0, -2:].ravel(),
            want[0, :, :2].ravel(), want[0, :, -2:].ravel(),
        ])
        np.testing.assert_allclose(edges, edges_want, atol=0.05, rtol=0.05)


class TestSampleDescriptorsMXU:
    def test_matches_gather_sampler(self):
        from ssp.postprocess.points import sample_descriptors, sample_descriptors_mxu

        rng = np.random.default_rng(0)
        coarse = jnp.asarray(rng.normal(size=(6, 8, 32)).astype(np.float32))
        pts = jnp.asarray(
            np.stack([rng.uniform(-2, 66, 50), rng.uniform(-2, 50, 50),
                      rng.uniform(0, 1, 50)], axis=1).astype(np.float32)
        )
        want = np.asarray(sample_descriptors(coarse, pts), np.float32)
        got = np.asarray(sample_descriptors_mxu(coarse, pts), np.float32)
        # bf16 matmul operands: compare directions
        cos = (want * got).sum(-1)
        assert cos.min() > 0.999, cos.min()


class TestDown1Packed:
    """x-pair packed down1 (ssp/kernels/down1_pallas.py) vs the XLA
    conv-conv-pool reference — reference forward
    models/SuperPointNet_gauss2.py:19-22 (down1, unet_parts.py:38-48)."""

    @staticmethod
    def _setup(B=2, H2=32, W2=48, seed=0):
        from ssp.kernels.stem_pallas import fold_bn

        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.uniform(size=(B, H2, W2, 64)), jnp.float32)

        def conv_bn(key):
            w = jnp.asarray(rng.normal(0, 0.15, (3, 3, 64, 64)), jnp.float32)
            g = jnp.asarray(rng.normal(1, 0.1, (64,)), jnp.float32)
            b = jnp.asarray(rng.normal(0, 0.1, (64,)), jnp.float32)
            m = jnp.asarray(rng.normal(0, 0.2, (64,)), jnp.float32)
            v = jnp.abs(jnp.asarray(rng.normal(1, 0.2, (64,)), jnp.float32)) + 0.1
            s, sb = fold_bn(g, b, m, v)
            return w, s, sb

        return (x,) + conv_bn(0) + conv_bn(1)

    @staticmethod
    def _xla_ref(x, wa, sa, ba, wb, sb_, bb, pool=True):
        def conv(xx, w):
            return jax.lax.conv_general_dilated(
                xx.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )

        o = jnp.maximum(conv(x, wa) * sa + ba, 0)
        o = jnp.maximum(conv(o, wb) * sb_ + bb, 0)
        if pool:
            o = jax.lax.reduce_window(
                o, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        return o

    @pytest.mark.parametrize("pool", [True, False])
    def test_parity_vs_xla(self, pool):
        from ssp.kernels.down1_pallas import down1_pallas_packed

        args = self._setup()
        got = np.asarray(
            down1_pallas_packed(*args, pool=pool, interpret=True), np.float32)
        want = np.asarray(self._xla_ref(*args, pool=pool), np.float32)
        if not pool:
            B, H2, W2 = want.shape[:3]
            got = got.reshape(B, H2, W2, 64)
        np.testing.assert_allclose(got, want, atol=0.08, rtol=0.05)

    def test_borders_same_padding(self):
        from ssp.kernels.down1_pallas import down1_pallas_packed

        args = self._setup(B=1, H2=16, W2=16, seed=3)
        got = np.asarray(
            down1_pallas_packed(*args, pool=False, interpret=True), np.float32)
        got = got.reshape(1, 16, 16, 64)
        want = np.asarray(self._xla_ref(*args, pool=False), np.float32)
        edges = np.stack([got[0, :2], got[0, -2:], got[0, :, :2].transpose(1, 0, 2),
                          got[0, :, -2:].transpose(1, 0, 2)])
        edges_want = np.stack([want[0, :2], want[0, -2:], want[0, :, :2].transpose(1, 0, 2),
                               want[0, :, -2:].transpose(1, 0, 2)])
        np.testing.assert_allclose(edges, edges_want, atol=0.08, rtol=0.05)
