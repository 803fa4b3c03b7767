"""SubpixelNet — UNet-decoder variant predicting dense subpixel offsets.

Capability parity with the reference's deprecated ``SubpixelNet``
(``models/SubpixelNet.py:13-90``): the shared VGG encoder plus detector
and descriptor heads, extended with a skip-connected decoder that
upsamples back to input resolution and emits a ``subpixel`` offset map.
Kept for checkpoint-era compatibility; the production subpixel path is
the post-hoc soft-argmax (``ssp.postprocess.points.soft_argmax_refine``).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ssp.models.superpoint import ConvBNRelu, DoubleConv, _maxpool2
from ssp.registry import register


class Up(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray, train: bool) -> jnp.ndarray:
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="linear").astype(self.dtype)
        x = jnp.concatenate([x, skip.astype(self.dtype)], axis=-1)
        return DoubleConv(self.features, self.dtype)(x, train)


@register("model", "SubpixelNet")
class SubpixelNet(nn.Module):
    subpixel_channel: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        c1, c2, c3, c4, c5, d1 = 64, 64, 128, 128, 256, 256
        x = x.astype(self.dtype)
        x1 = DoubleConv(c1, self.dtype, name="inc")(x, train)
        x2 = DoubleConv(c2, self.dtype, name="down1")(_maxpool2(x1), train)
        x3 = DoubleConv(c3, self.dtype, name="down2")(_maxpool2(x2), train)
        x4 = DoubleConv(c4, self.dtype, name="down3")(_maxpool2(x3), train)

        cPa = ConvBNRelu(c5, 3, self.dtype, name="convPa")(x4, train)
        semi = ConvBNRelu(65, 1, self.dtype, use_relu=False, name="convPb")(cPa, train)
        cDa = ConvBNRelu(c5, 3, self.dtype, name="convDa")(x4, train)
        desc = ConvBNRelu(d1, 1, self.dtype, use_relu=False, name="convDb")(cDa, train)
        desc32 = desc.astype(jnp.float32)
        desc32 = desc32 / (jnp.linalg.norm(desc32, axis=-1, keepdims=True) + 1e-12)

        u = Up(c2, self.dtype, name="up1")(x4, x3, train)
        u = Up(c1, self.dtype, name="up2")(u, x2, train)
        u = Up(c1, self.dtype, name="up3")(u, x1, train)
        offsets = nn.Conv(
            self.subpixel_channel, (1, 1), dtype=self.dtype,
            param_dtype=jnp.float32, name="outc",
        )(u)

        return {
            "semi": semi.astype(jnp.float32),
            "desc": desc32,
            "subpixel": offsets.astype(jnp.float32),
        }
