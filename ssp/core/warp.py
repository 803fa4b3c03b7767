"""Image warping and valid masks, pure JAX (gather-based sampling).

Replaces the reference's ``F.grid_sample``-backed ``inv_warp_image_batch``
(``utils/utils.py:347-385``) and ``compute_valid_mask``
(``utils/utils.py:715-742``).  Coordinate convention matches
``grid_sample(..., align_corners=True)``: normalized x ∈ [-1, 1] maps
linearly onto pixel centres ``0 … W-1``; samples outside the image
contribute zeros (zero padding).

The sampler is written as clipped gathers + in-bounds weights, which XLA
lowers to efficient dynamic-gather on TPU and which vmaps cleanly over
batches/channels — no scatter, no dynamic shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssp.core.homography import warp_points


def _gather_hw(img: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """img [H, W, C], integer index maps iy/ix [...] → [..., C] (clipped)."""
    H, W = img.shape[0], img.shape[1]
    iy = jnp.clip(iy, 0, H - 1)
    ix = jnp.clip(ix, 0, W - 1)
    flat = img.reshape(H * W, img.shape[2])
    return flat[iy * W + ix]


def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample with zero padding.

    img: [H, W, C]; coords: [..., 2] (x, y) in *pixel* units.
    Returns [..., C].  Out-of-bounds neighbours contribute 0, matching
    ``grid_sample(padding_mode="zeros", align_corners=True)``.
    """
    H, W = img.shape[0], img.shape[1]
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)

    def inb(iy, ix):
        ok = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
        return ok[..., None].astype(img.dtype)

    v00 = _gather_hw(img, y0i, x0i) * inb(y0i, x0i)
    v01 = _gather_hw(img, y0i, x0i + 1) * inb(y0i, x0i + 1)
    v10 = _gather_hw(img, y0i + 1, x0i) * inb(y0i + 1, x0i)
    v11 = _gather_hw(img, y0i + 1, x0i + 1) * inb(y0i + 1, x0i + 1)

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def nearest_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour sample with zero padding (same contract)."""
    H, W = img.shape[0], img.shape[1]
    ix = jnp.round(coords[..., 0]).astype(jnp.int32)
    iy = jnp.round(coords[..., 1]).astype(jnp.int32)
    ok = ((iy >= 0) & (iy < H) & (ix >= 0) & (ix < W))[..., None]
    return _gather_hw(img, iy, ix) * ok.astype(img.dtype)


def _norm_grid(H: int, W: int) -> jnp.ndarray:
    """[-1, 1]² align-corners grid of shape [H, W, 2] (x, y)."""
    xs = jnp.linspace(-1.0, 1.0, W)
    ys = jnp.linspace(-1.0, 1.0, H)
    gx, gy = jnp.meshgrid(xs, ys)  # [H, W]
    return jnp.stack([gx, gy], axis=-1)


def _denorm(coords: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """normalized (x, y) in [-1, 1] → pixel coords (align_corners=True)."""
    x = (coords[..., 0] + 1.0) * (W - 1) / 2.0
    y = (coords[..., 1] + 1.0) * (H - 1) / 2.0
    return jnp.stack([x, y], axis=-1)


def inv_warp_image(
    img: jnp.ndarray, H_inv: jnp.ndarray, mode: str = "bilinear"
) -> jnp.ndarray:
    """Inverse-warp ``img [H, W, C]`` by ``H_inv [3, 3]`` (normalized coords).

    For every output pixel, its normalized coordinate is mapped through
    ``H_inv`` and the input is sampled there (reference
    ``inv_warp_image_batch``, ``utils/utils.py:347-385``).  Batch it with
    ``jax.vmap`` — e.g. ``vmap(inv_warp_image)(imgs, Hs)`` for the
    homography-adaptation warp stack.
    """
    height, width = img.shape[0], img.shape[1]
    grid = _norm_grid(height, width).reshape(-1, 2)
    src = warp_points(grid, H_inv)
    src_pix = _denorm(src, height, width)
    sample = bilinear_sample if mode == "bilinear" else nearest_sample
    out = sample(img, src_pix)
    return out.reshape(height, width, img.shape[2])


def _ellipse_offsets(radius: int) -> np.ndarray:
    """Nonzero offsets of cv2's MORPH_ELLIPSE structuring element of size
    ``(2·radius, 2·radius)`` — static host-side table used to unroll the
    erosion into a fixed stack of shifts (reference erodes with exactly
    this kernel, ``utils/utils.py:736-740``)."""
    import cv2

    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (radius * 2, radius * 2))
    ys, xs = np.nonzero(k)
    cy, cx = k.shape[0] // 2, k.shape[1] // 2
    return np.stack([ys - cy, xs - cx], axis=-1)


def erode_mask(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Binary erosion of ``mask [..., H, W]`` by the ellipse element.

    Erosion = min over the (static) set of kernel offsets; implemented as
    an unrolled elementwise-min over shifted copies, which XLA fuses into
    a single VPU loop.  Out-of-image neighbours are treated as 1 (cv2
    BORDER_CONSTANT replicates border for erode; using pad=1 keeps edge
    behaviour equal to cv2's default border handling for binary masks).
    """
    if radius <= 0:
        return mask
    offsets = _ellipse_offsets(radius)
    out = mask
    for dy, dx in offsets:
        shifted = jnp.roll(mask, (-int(dy), -int(dx)), axis=(-2, -1))
        # wrapped-around regions read outside the image: treat as 1
        # (non-eroding), matching cv2.erode's default border value
        H, W = mask.shape[-2], mask.shape[-1]
        ys = jnp.arange(H) + int(dy)
        xs = jnp.arange(W) + int(dx)
        ok = ((ys >= 0) & (ys < H))[:, None] & ((xs >= 0) & (xs < W))[None, :]
        shifted = jnp.where(ok, shifted, 1.0)
        out = jnp.minimum(out, shifted)
    return out


def compute_valid_mask(
    shape: Tuple[int, int], H_inv: jnp.ndarray, erosion_radius: int = 0
) -> jnp.ndarray:
    """Mask of pixels that map inside the source image under ``H_inv``.

    Reference semantics: warp an all-ones image (nearest) and erode with
    a cv2 MORPH_ELLIPSE kernel (``utils/utils.py:715-742``).  The warp
    step is computed in closed form — the valid region is exactly the
    set of pixels whose normalized coordinates map into [-1, 1]², four
    inequality tests, no gathers — and the erosion is the exact unrolled
    ellipse min-filter (``erode_mask``), whose static offset table equals
    cv2's structuring element and whose border handling (outside = 1)
    equals cv2.erode's default border.  Agreement with the cv2 oracle is
    pixel-exact (``tests/test_core_geometry.py``).

    Returns [H, W] float.
    """
    H_px, W_px = shape
    grid = _norm_grid(H_px, W_px).reshape(-1, 2)
    src = warp_points(grid, H_inv)  # normalized source coords

    # nearest-warp in-bounds test: |coord| <= 1 (+ half-pixel rounding)
    hx = 1.0 / (W_px - 1)
    hy = 1.0 / (H_px - 1)
    ok = (
        (src[:, 0] >= -1.0 - hx)
        & (src[:, 0] <= 1.0 + hx)
        & (src[:, 1] >= -1.0 - hy)
        & (src[:, 1] <= 1.0 + hy)
    )
    mask = ok.reshape(H_px, W_px).astype(jnp.float32)
    if erosion_radius > 0:
        mask = erode_mask(mask, erosion_radius)
    return mask
