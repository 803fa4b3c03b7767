"""SuperPoint / Semantic-SuperPoint backbones, TPU-first.

Capability spec from the reference models
(``/root/reference/models/SuperPointNet_gauss2.py:19-69``,
``models/SuperPointNet_gauss2_ssmall.py:17-99``,
``models/SuperPointNet_pretrained.py:21-60``): a VGG-style shared
encoder at 1/8 resolution feeding a 65-channel detector head, a
256-channel L2-normalized descriptor head, and (semantic variant) an
n_classes segmentation head bilinearly upsampled to input resolution.
BN-then-ReLU ordering, 1×1 head output convs followed by BN (no ReLU).

TPU-first choices:
  * NHWC layout and channel counts already MXU-friendly
    (64/128/256 lanes).
  * Compute dtype is a constructor arg (default bfloat16); params and BN
    statistics stay float32.  XLA fuses conv+BN+ReLU chains.
  * Heads run on the shared 1/8-res feature map; the whole forward is
    one fused graph under jit — no Python branching on data.
  * BatchNorm under the jit/pjit train step computes batch statistics
    over the **global** batch regardless of sharding — the reduction
    over the batch axis is partitioned by GSPMD, which inserts the
    cross-device collective (verified: sharded vs unsharded stats agree
    to fp noise, ``tests/test_multichip.py``).  With the shipped
    configs (real_batch_size 16) this is exactly the reference's
    batch-16 BN.  ``bn_cross_replica``/``mesh_data_axis`` bind an
    explicit ``axis_name`` and matter only if the step is ever run
    under ``shard_map``/``pmap`` (where reductions are per-device by
    default); leave False under jit.  The reference's *micro-batch* BN
    (gradient accumulation) is reproduced by the trainer's
    ``exact_accumulation`` mode instead.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ssp.registry import register


class ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    dtype: Any = jnp.bfloat16
    use_relu: bool = True
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding="SAME",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.he_uniform(),
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,  # keep statistics math in fp32
            axis_name=self.bn_axis_name,
        )(x)
        if self.use_relu:
            x = nn.relu(x)
        return x.astype(self.dtype)


class DoubleConv(nn.Module):
    """(conv3×3 → BN → ReLU) × 2 — reference ``models/unet_parts.py:10-25``."""

    features: int
    dtype: Any = jnp.bfloat16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = ConvBNRelu(self.features, 3, self.dtype, bn_axis_name=self.bn_axis_name)(x, train)
        x = ConvBNRelu(self.features, 3, self.dtype, bn_axis_name=self.bn_axis_name)(x, train)
        return x


def _maxpool2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class SuperPointGauss2(nn.Module):
    """Detector + descriptor (+ optional semantic head) network.

    Registry names ``SuperPointNet_gauss2`` (no semantic head) and
    ``SuperPointNet_gauss2_ssmall`` (with head, reference
    ``models/SuperPointNet_gauss2_ssmall.py``).

    Returns dict with NHWC tensors:
      ``semi`` [B, H/8, W/8, 65] — detector logits (65th = dustbin)
      ``desc`` [B, H/8, W/8, 256] — L2-normalized coarse descriptors
      ``sem``  [B, H, W, n_classes] — only when ``semantic=True``
    """

    semantic: bool = False
    n_classes: int = 133
    dtype: Any = jnp.bfloat16
    bn_cross_replica: bool = False
    mesh_data_axis: str = "data"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 upsample_sem: bool = True) -> Dict[str, jnp.ndarray]:
        c1, c2, c3, c4, c5, d1 = 64, 64, 128, 128, 256, 256
        det_h = 65
        axis = self.mesh_data_axis if self.bn_cross_replica else None

        x = x.astype(self.dtype)
        x = DoubleConv(c1, self.dtype, axis, name="inc")(x, train)
        x = DoubleConv(c2, self.dtype, axis, name="down1")(_maxpool2(x), train)
        x = DoubleConv(c3, self.dtype, axis, name="down2")(_maxpool2(x), train)
        feat = DoubleConv(c4, self.dtype, axis, name="down3")(_maxpool2(x), train)

        # Detector head: conv3(128→256)+BN+ReLU → conv1(256→65)+BN
        cPa = ConvBNRelu(c5, 3, self.dtype, bn_axis_name=axis, name="convPa")(feat, train)
        semi = ConvBNRelu(det_h, 1, self.dtype, use_relu=False, bn_axis_name=axis, name="convPb")(cPa, train)

        # Descriptor head: conv3(128→256)+BN+ReLU → conv1(256→256)+BN → L2
        cDa = ConvBNRelu(c5, 3, self.dtype, bn_axis_name=axis, name="convDa")(feat, train)
        desc = ConvBNRelu(d1, 1, self.dtype, use_relu=False, bn_axis_name=axis, name="convDb")(cDa, train)
        desc32 = desc.astype(jnp.float32)
        desc32 = desc32 / (jnp.linalg.norm(desc32, axis=-1, keepdims=True) + 1e-12)

        out: Dict[str, jnp.ndarray] = {
            "semi": semi.astype(jnp.float32),
            "desc": desc32,
        }

        if self.semantic:
            # Seg head: conv3(128→256)+BN+ReLU → conv1(256→n_classes) →
            # bilinear ↑8 (align_corners=False ≙ jax.image 'linear')
            cS = ConvBNRelu(c5, 3, self.dtype, bn_axis_name=axis, name="convDS")(feat, train)
            sem = nn.Conv(
                self.n_classes,
                (1, 1),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=nn.initializers.he_uniform(),
                name="convSout",
            )(cS)
            B, Hc, Wc, _ = sem.shape
            if upsample_sem:
                out["sem"] = jax.image.resize(
                    sem.astype(jnp.float32),
                    (B, Hc * 8, Wc * 8, self.n_classes),
                    method="linear",
                )
            else:
                # training path: the fused CE (semantic_loss_coarse)
                # consumes 1/8-res logits directly — the 650 MB
                # full-res tensor is never materialized
                out["sem_coarse"] = sem.astype(jnp.float32)

        return out


class SuperPointMagicLeap(nn.Module):
    """MagicLeap-style SuperPoint: plain VGG encoder, no BatchNorm.

    Architecture spec: ``models/SuperPointNet_pretrained.py:21-60`` —
    channels 64,64,64,64,128,128,128,128 with 3 maxpools, heads
    conv3(128→256)+ReLU → conv1(256→65|256).  Registry name
    ``SuperPointNet_pretrained`` (used for importing the public
    superpoint_v1 weights).
    """

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        def conv(x, f, k, name, relu=True):
            x = nn.Conv(
                f, (k, k), padding="SAME", dtype=self.dtype,
                param_dtype=jnp.float32, name=name,
            )(x)
            return nn.relu(x) if relu else x

        x = x.astype(self.dtype)
        x = conv(x, 64, 3, "conv1a"); x = conv(x, 64, 3, "conv1b"); x = _maxpool2(x)
        x = conv(x, 64, 3, "conv2a"); x = conv(x, 64, 3, "conv2b"); x = _maxpool2(x)
        x = conv(x, 128, 3, "conv3a"); x = conv(x, 128, 3, "conv3b"); x = _maxpool2(x)
        x = conv(x, 128, 3, "conv4a"); x = conv(x, 128, 3, "conv4b")

        cPa = conv(x, 256, 3, "convPa")
        semi = conv(cPa, 65, 1, "convPb", relu=False)
        cDa = conv(x, 256, 3, "convDa")
        desc = conv(cDa, 256, 1, "convDb", relu=False).astype(jnp.float32)
        desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-12)
        return {"semi": semi.astype(jnp.float32), "desc": desc}


@register("model", "SuperPointNet_gauss2")
def _gauss2(**params) -> SuperPointGauss2:
    params.pop("n_classes", None)
    return SuperPointGauss2(semantic=False, **params)


@register("model", "SuperPointNet_gauss2_ssmall")
def _gauss2_ssmall(n_classes: int = 133, **params) -> SuperPointGauss2:
    return SuperPointGauss2(semantic=True, n_classes=n_classes, **params)


@register("model", "SuperPointNet_pretrained")
def _magicleap(**params) -> SuperPointMagicLeap:
    return SuperPointMagicLeap(**params)


def build_model(name: str, **params):
    """Model factory by reference-compatible name."""
    from ssp import registry

    return registry.get("model", name)(**params)
