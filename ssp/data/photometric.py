"""On-device photometric augmentation, pure JAX.

The reference augments on CPU workers with imgaug
(``utils/photometric.py:1-190``, primitives and parameter ranges from
rpautrat/SuperPoint).  Here the same six primitives run inside the
jitted batch-preparation program: per-image random parameters come from
JAX PRNG keys, and the two convolution-shaped primitives (motion blur,
shade blur) are expressed as one grouped convolution with per-image
kernels — batch folded into channels, ``feature_group_count = B`` — so
XLA executes the whole batch's distinct kernels as a single conv.

Parameter ranges keep the reference's 0-255 units (configs are shared
verbatim); images are float in [0, 1], so additive quantities divide by
255 internally.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

ALL_PRIMITIVES = (
    "random_brightness",
    "random_contrast",
    "additive_speckle_noise",
    "additive_gaussian_noise",
    "additive_shade",
    "motion_blur",
)

DEFAULT_PARAMS: Dict[str, Any] = {
    "random_brightness": {"max_abs_change": 50},
    "random_contrast": {"strength_range": [0.5, 1.5]},
    "additive_gaussian_noise": {"stddev_range": [0, 10]},
    "additive_speckle_noise": {"prob_range": [0, 0.0035]},
    "additive_shade": {
        "transparency_range": [-0.5, 0.5],
        "kernel_size_range": [100, 150],
        "nb_ellipses": 20,
    },
    "motion_blur": {"max_kernel_size": 3},
}


def _per_image_conv(imgs: jnp.ndarray, kernels: jnp.ndarray) -> jnp.ndarray:
    """imgs [B, H, W] ⊛ kernels [B, kh, kw], 'same' padding, one grouped
    conv (each image is its own feature group)."""
    B = imgs.shape[0]
    x = jnp.transpose(imgs, (1, 2, 0))[None]  # [1, H, W, B]
    k = jnp.transpose(kernels, (1, 2, 0))[:, :, None, :]  # [kh, kw, 1, B]
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=B,
    )
    return jnp.transpose(out[0], (2, 0, 1))


def gaussian_blur(imgs: jnp.ndarray, sigma: float, truncate: float = 3.0) -> jnp.ndarray:
    """Separable Gaussian blur of ``imgs [B, H, W]``; the kernel is
    normalized so total mass is preserved away from borders."""
    radius = max(int(math.ceil(truncate * float(sigma))), 1)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k1 = jnp.exp(-0.5 * (x / sigma) ** 2)
    k1 = k1 / jnp.sum(k1)
    B = imgs.shape[0]
    kx = jnp.broadcast_to(k1[None, None, :], (B, 1, k1.shape[0]))
    ky = jnp.broadcast_to(k1[None, :, None], (B, k1.shape[0], 1))
    return _per_image_conv(_per_image_conv(imgs, kx), ky)


# ---------------------------------------------------------- primitives
def random_brightness(key, imgs, max_abs_change=50):
    delta = jax.random.uniform(
        key, (imgs.shape[0], 1, 1),
        minval=-max_abs_change / 255.0, maxval=max_abs_change / 255.0,
    )
    return jnp.clip(imgs + delta, 0.0, 1.0)


def random_contrast(key, imgs, strength_range=(0.5, 1.5)):
    f = jax.random.uniform(
        key, (imgs.shape[0], 1, 1),
        minval=strength_range[0], maxval=strength_range[1],
    )
    mean = jnp.mean(imgs, axis=(1, 2), keepdims=True)
    return jnp.clip((imgs - mean) * f + mean, 0.0, 1.0)


def additive_gaussian_noise(key, imgs, stddev_range=(0, 10)):
    k_std, k_noise = jax.random.split(key)
    std = jax.random.uniform(
        k_std, (imgs.shape[0], 1, 1),
        minval=stddev_range[0] / 255.0, maxval=stddev_range[1] / 255.0,
    )
    noise = jax.random.normal(k_noise, imgs.shape) * std
    return jnp.clip(imgs + noise, 0.0, 1.0)


def additive_speckle_noise(key, imgs, prob_range=(0, 0.0035)):
    """Salt-and-pepper: with per-image probability p each pixel snaps to
    0 or 1 (reference ``utils/photometric.py`` speckle)."""
    k_p, k_u = jax.random.split(key)
    p = jax.random.uniform(
        k_p, (imgs.shape[0], 1, 1), minval=prob_range[0], maxval=prob_range[1]
    )
    u = jax.random.uniform(k_u, imgs.shape)
    out = jnp.where(u < p, 0.0, imgs)
    return jnp.where(u > 1.0 - p, 1.0, out)


def additive_shade(
    key, imgs, transparency_range=(-0.5, 0.8), kernel_size_range=(50, 100),
    nb_ellipses=20,
):
    """Multiply by (1 − t·mask) where the mask is a heavily blurred union
    of random ellipses — soft shadow (t > 0) or glare (t < 0) patches.

    The reference draws cv2 ellipses and blurs on the host; here the
    union and the blur are closed-form on device: an ellipse indicator
    is one quadratic-form test, and the blur kernel size is drawn from
    the same range and converted to an equivalent Gaussian σ ≈ k/4.

    The mask is built and blurred at 4× downsample when the image
    divides evenly, then bilinearly upsampled: the shade field is
    band-limited far below that Nyquist (ellipse radii ≥ min_dim/12,
    blur σ ≥ 12 px), and the full-res per-image grouped blur was the
    single most expensive prep op at 240×320 (the conv puts the batch
    in the lane dim — ~12% lane utilization — and the 101-tap kernel
    scales with resolution; measured 31 ms of a 63 ms prepare_batch
    at [16, 240, 320], vs ~1 ms done this way).
    """
    B, H, W = imgs.shape
    k_t, k_geo, k_ks = jax.random.split(key, 3)
    t = jax.random.uniform(
        k_t, (B, 1, 1), minval=transparency_range[0], maxval=transparency_range[1]
    )
    n = int(nb_ellipses)
    kc, kr, ka = jax.random.split(k_geo, 3)
    # centers anywhere, radii in [min_dim/12, min_dim/3], random tilt
    min_dim = min(H, W)
    centers = jax.random.uniform(kc, (B, n, 2)) * jnp.array([W, H], jnp.float32)
    radii = jax.random.uniform(
        kr, (B, n, 2), minval=min_dim / 12.0, maxval=min_dim / 3.0
    )
    theta = jax.random.uniform(ka, (B, n), maxval=math.pi)

    f = 4 if (H % 4 == 0 and W % 4 == 0) else 1
    Hm, Wm = H // f, W // f
    # pixel-centre coordinates of the low-res grid in full-res units
    ys, xs = jnp.mgrid[0:Hm, 0:Wm].astype(jnp.float32)
    ys = ys * f + (f - 1) / 2.0
    xs = xs * f + (f - 1) / 2.0
    dx = xs[None, None] - centers[..., 0, None, None]
    dy = ys[None, None] - centers[..., 1, None, None]
    c, s = jnp.cos(theta)[..., None, None], jnp.sin(theta)[..., None, None]
    u = (c * dx + s * dy) / radii[..., 0, None, None]
    v = (-s * dx + c * dy) / radii[..., 1, None, None]
    mask = jnp.max((u * u + v * v <= 1.0).astype(jnp.float32), axis=1)  # [B, Hm, Wm]

    # per-image kernel size (the reference draws one per call = per
    # image; a scalar here would share one blur σ across the batch)
    ks = jax.random.uniform(
        k_ks, (B, 1), minval=kernel_size_range[0], maxval=kernel_size_range[1]
    )
    # box-blur of size k ≈ Gaussian with σ = k/4 (static kernel extent:
    # σ capped by the range's max so shapes stay fixed under jit);
    # applied in low-res units
    sigma_max = kernel_size_range[1] / 4.0 / f
    radius = max(int(math.ceil(2.0 * sigma_max)), 1)
    xk = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    sigma = ks / 4.0 / f  # [B, 1]
    k1 = jnp.exp(-0.5 * (xk[None, :] / sigma) ** 2)  # [B, K]
    k1 = k1 / jnp.sum(k1, axis=-1, keepdims=True)
    kx = k1[:, None, :]
    ky = k1[:, :, None]
    mask = _per_image_conv(_per_image_conv(mask, kx), ky)
    if f > 1:
        mask = jax.image.resize(mask, (B, H, W), method="bilinear")
    return jnp.clip(imgs * (1.0 - t * mask), 0.0, 1.0)


def motion_blur(key, imgs, max_kernel_size=7):
    """Directional blur with a per-image random angle and length.

    The kernel is a soft line segment rasterized in closed form on a
    static (max_kernel_size)² grid; length is randomized by masking the
    line's extent, so one grouped conv serves every image."""
    B = imgs.shape[0]
    K = int(max_kernel_size) | 1
    if K <= 1:
        return imgs
    k_ang, k_len = jax.random.split(key)
    theta = jax.random.uniform(k_ang, (B,), maxval=math.pi)
    half = jax.random.uniform(k_len, (B,), minval=0.5, maxval=K / 2.0)

    r = K // 2
    ys, xs = jnp.mgrid[-r : r + 1, -r : r + 1].astype(jnp.float32)
    c, s = jnp.cos(theta)[:, None, None], jnp.sin(theta)[:, None, None]
    along = c * xs[None] + s * ys[None]
    perp = -s * xs[None] + c * ys[None]
    line = jnp.clip(1.0 - jnp.abs(perp), 0.0, 1.0) * (
        jnp.abs(along) <= half[:, None, None]
    )
    line = line / jnp.maximum(jnp.sum(line, axis=(1, 2), keepdims=True), 1e-6)
    return _per_image_conv(imgs, line)


_PRIMITIVE_FNS = {
    "random_brightness": random_brightness,
    "random_contrast": random_contrast,
    "additive_gaussian_noise": additive_gaussian_noise,
    "additive_speckle_noise": additive_speckle_noise,
    "additive_shade": additive_shade,
    "motion_blur": motion_blur,
}


def photometric_augment(
    key: jax.Array,
    imgs: jnp.ndarray,
    primitives: Optional[Sequence[str]] = None,
    params: Optional[Dict[str, Dict[str, Any]]] = None,
) -> jnp.ndarray:
    """Apply the configured photometric primitives to ``imgs [B, H, W]``.

    ``primitives``/``params`` follow the reference's YAML schema
    (``configs/*:augmentation.photometric``).  Primitives apply in the
    listed order (the reference optionally shuffles; a fixed order keeps
    the program static — the distributions are unchanged).
    """
    names = list(primitives) if primitives else list(ALL_PRIMITIVES)
    params = params or {}
    out = imgs
    for name in names:
        fn = _PRIMITIVE_FNS.get(name)
        if fn is None:
            raise KeyError(f"unknown photometric primitive {name!r}")
        key, sub = jax.random.split(key)
        kw = dict(DEFAULT_PARAMS.get(name, {}))
        kw.update(params.get(name, {}) or {})
        out = fn(sub, out, **kw)
    return jnp.clip(out, 0.0, 1.0)
