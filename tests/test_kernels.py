"""Pallas kernels vs XLA references (interpret mode on CPU)."""

import numpy as np
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

    def test_non_lane_aligned_width(self):
        # W=320 (not a multiple of 128) exercises the lane-padding path
        rng = np.random.default_rng(5)
        heat = (rng.uniform(size=(2, 256, 320)) ** 4).astype(np.float32)
        want = np.asarray(simple_nms(jnp.asarray(heat), radius=4, iterations=3))
        got = np.asarray(nms_pallas(jnp.asarray(heat), radius=4, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-6)
