"""Device-side batch preparation: one jitted program from host batch to
training batch.

Replaces the reference's CPU-worker label pipeline
(``datasets/Coco.py:258-430`` + ``datasets/data_tools.py:15-63``):
photometric augmentation, homographic augmentation, warped-pair
construction, point warping, label/residual splatting, valid masks and
semantic-label warping all execute on device with fixed shapes, keyed
by JAX PRNG.

Reference semantics preserved (``datasets/Coco.py:341-404``):
  * the warped pair warps the **clean** (pre-photometric) content, and
    photometric augmentation is applied to the base and the warp
    independently — the two views never share a corruption;
  * fractional keypoint residuals survive label construction as
    ``labels_res`` / ``warped_res`` maps (``data_tools.py:37-63``), the
    supervision signal for subpixel refinement.

Conventions: points are (x, y) in pixel units; homographies act on
``align_corners`` normalized coordinates ([-1, 1] ↔ pixel centres
0…W-1); ``H_pair`` maps base points → warped-view points, and images
are resampled with its inverse (``H_pair_inv``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ssp.core.homography import inv3, sample_homography, warp_points
from ssp.core.warp import compute_valid_mask, inv_warp_image
from ssp.data.photometric import gaussian_blur, photometric_augment


def pad_points(pts_list, k: Optional[int] = None):
    """Host-side: ragged [(Nᵢ, 2)] → (points [B, K, 2] f32, valid [B, K]).

    Fixed K keeps every downstream program static-shaped (the
    reference's collate pads similarly via ``points_to_2D``).
    """
    import numpy as np

    if k is None:
        k = max((len(p) for p in pts_list), default=1)
        k = max(k, 1)
    B = len(pts_list)
    points = np.zeros((B, k, 2), np.float32)
    valid = np.zeros((B, k), bool)
    for i, p in enumerate(pts_list):
        p = np.asarray(p, np.float32).reshape(-1, 2)[:k]
        points[i, : len(p)] = p
        valid[i, : len(p)] = True
    return points, valid


def splat_labels(
    pts: jnp.ndarray, valid: jnp.ndarray, shape: Tuple[int, int]
) -> jnp.ndarray:
    """Scatter keypoints into a binary [H, W] map.

    ``pts [N, 2]`` (x, y) round to the nearest pixel; invalid and
    out-of-bounds points are dropped (reference ``points_to_2D``,
    ``datasets/Coco.py:304``).  Scatter-max, so coincident points stay
    binary.
    """
    H, W = shape
    ix = jnp.round(pts[:, 0]).astype(jnp.int32)
    iy = jnp.round(pts[:, 1]).astype(jnp.int32)
    ok = valid & (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    lin = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
    out = jnp.zeros((H * W,), jnp.float32).at[lin].max(ok.astype(jnp.float32))
    return out.reshape(H, W)


def splat_residuals(
    pts: jnp.ndarray, valid: jnp.ndarray, shape: Tuple[int, int]
) -> jnp.ndarray:
    """[H, W, 2] map of fractional offsets (x − round x, y − round y) at
    each keypoint's cell — the reference keeps these through its label
    pipeline for subpixel supervision (``data_tools.py:58-60``)."""
    H, W = shape
    ix = jnp.round(pts[:, 0]).astype(jnp.int32)
    iy = jnp.round(pts[:, 1]).astype(jnp.int32)
    ok = valid & (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    res = (pts - jnp.round(pts)) * ok[:, None]
    lin = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
    out = jnp.zeros((H * W, 2), jnp.float32).at[lin].add(res)
    return out.reshape(H, W, 2)


def _pix_to_norm(pts: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    scale = jnp.array([(W - 1) / 2.0, (H - 1) / 2.0], jnp.float32)
    return pts / scale - 1.0


def _norm_to_pix(pts: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    scale = jnp.array([(W - 1) / 2.0, (H - 1) / 2.0], jnp.float32)
    return (pts + 1.0) * scale


def _warp_sample(
    key: jax.Array,
    images: jnp.ndarray,
    points: jnp.ndarray,
    points_valid: jnp.ndarray,
    sem: Optional[jnp.ndarray],
    params: Dict[str, Any],
    erosion: int,
    ignore_class: int,
    sem_warp_mode: str = "bilinear",
):
    """Sample one homography per image and warp (image, points, sem).

    Returns (H_fwd, H_inv, warped_images, warped_points, valid_mask,
    warped_sem).  H_fwd maps source points to warped-view points in
    normalized coordinates.
    """
    B, H_px, W_px = images.shape
    keys = jax.random.split(key, B)
    clean = {k: v for k, v in (params or {}).items() if k != "valid_border_margin"}
    H_inv = jax.vmap(lambda k: sample_homography(k, **clean))(keys)
    H_inv = H_inv.astype(jnp.float32)
    H_fwd = inv3(H_inv)

    # TPU: the gather-based bilinear warp is the single largest prep
    # cost (measured 25 of 27 ms at batch 32, 120×160 — TPU gathers run
    # ~100 M samples/s); the gather-free two-pass warp is sub-ms at the
    # same shapes.  CPU/GPU keep the gather path (there the roles
    # reverse: the two-pass one-hot fallback is the slow one).
    if jax.default_backend() == "tpu":
        from ssp.kernels.warp_twopass import inv_warp_image_twopass

        warped = jax.vmap(inv_warp_image_twopass)(images, H_inv)
    else:
        warped = jax.vmap(lambda im, h: inv_warp_image(im[..., None], h))(
            images, H_inv
        )[..., 0]

    pn = _pix_to_norm(points, H_px, W_px)
    wn = jax.vmap(warp_points)(pn, H_fwd)
    wpts = _norm_to_pix(wn, H_px, W_px)
    # points warped out of frame stop being labels (the splats drop them
    # anyway; validity must agree so e.g. residual diagnostics don't
    # read patches at clipped positions — reference filter_points,
    # datasets/data_tools.py:47-52)
    points_valid = (
        points_valid
        & (wpts[..., 0] >= 0) & (wpts[..., 0] <= W_px - 1)
        & (wpts[..., 1] >= 0) & (wpts[..., 1] <= H_px - 1)
    )

    mask = jax.vmap(
        lambda h: compute_valid_mask((H_px, W_px), h, erosion_radius=erosion)
    )(H_inv)

    wsem = None
    if sem is not None:
        if sem_warp_mode == "bilinear":
            # the reference's own semantics: class IDS are bilinearly
            # interpolated as floats, then truncated to int
            # (``datasets/Coco_sem.py:406-409`` warps with
            # mode="bilinear"; torch ``.long()`` downstream truncates).
            # On TPU this rides the gather-free two-pass warp — the
            # nearest path's per-pixel gather was 13 ms of the wsem
            # step (PERF.md round-4).
            semf = sem.astype(jnp.float32)
            if jax.default_backend() == "tpu":
                from ssp.kernels.warp_twopass import inv_warp_image_twopass

                wsem_f = jax.vmap(inv_warp_image_twopass)(semf, H_inv)
            else:
                wsem_f = jax.vmap(
                    lambda s, h: inv_warp_image(s[..., None], h, mode="bilinear")
                )(semf, H_inv)[..., 0]
        else:  # "nearest": exact label transport (no boundary blending)
            wsem_f = jax.vmap(
                lambda s, h: inv_warp_image(
                    s[..., None].astype(jnp.float32), h, mode="nearest")
            )(sem, H_inv)[..., 0]
        wsem = jnp.where(mask > 0, wsem_f.astype(jnp.int32), ignore_class)
    return H_fwd, H_inv, warped, wpts, points_valid, mask, wsem


def _labels_for(points, valid, shape, sigma):
    """labels_2d [B, H, W, 1] (+ optional Gaussian spread) and
    labels_res [B, H, W, 2]."""
    labels = jax.vmap(lambda p, v: splat_labels(p, v, shape))(points, valid)
    res = jax.vmap(lambda p, v: splat_residuals(p, v, shape))(points, valid)
    if sigma:
        blurred = gaussian_blur(labels, float(sigma))
        peak = jnp.max(blurred, axis=(1, 2), keepdims=True)
        labels = blurred / jnp.maximum(peak, 1e-6)
    return labels[..., None], res


def prepare_batch(
    key: jax.Array,
    images: jnp.ndarray,
    points: jnp.ndarray,
    points_valid: jnp.ndarray,
    *,
    sem: Optional[jnp.ndarray] = None,
    photometric: Optional[Dict[str, Any]] = None,
    homographic: Optional[Dict[str, Any]] = None,
    warped_pair: Optional[Dict[str, Any]] = None,
    gaussian_label_sigma: Optional[float] = None,
    ignore_class: int = 133,
    sem_warp_mode: str = "bilinear",
) -> Dict[str, jnp.ndarray]:
    """Host batch → training batch, entirely on device.

    Inputs: ``images [B, H, W]`` float ∈ [0, 1], ``points [B, K, 2]``
    (x, y), ``points_valid [B, K]``, optional ``sem [B, H, W]`` int.
    Config dicts follow the reference's YAML schema.

    Stages (mirroring ``datasets/Coco.py:341-404``):
      1. homographic augmentation (optional) rewrites the clean content:
         image, points, sem and the valid mask all move together;
      2. the base view is the clean content plus independent photometric
         augmentation;
      3. the warped pair (optional) resamples the **clean** content with
         a fresh homography and applies its own photometric draw.
    """
    B, H_px, W_px = images.shape
    shape = (H_px, W_px)
    key, k_homo, k_photo1, k_pair, k_photo2 = jax.random.split(key, 5)

    clean = images
    valid_mask = jnp.ones((B, H_px, W_px), jnp.float32)
    cur_sem = sem

    if homographic and homographic.get("enable"):
        erosion = int(homographic.get("valid_border_margin", 0))
        _, _, clean, points, points_valid, valid_mask, cur_sem = _warp_sample(
            k_homo, clean, points, points_valid, sem,
            homographic.get("params") or {}, erosion, ignore_class,
            sem_warp_mode,
        )

    base = clean
    if photometric and photometric.get("enable"):
        base = photometric_augment(
            k_photo1, base,
            primitives=photometric.get("primitives"),
            params=photometric.get("params"),
        )

    labels_2d, labels_res = _labels_for(
        points, points_valid, shape, gaussian_label_sigma
    )
    batch: Dict[str, jnp.ndarray] = {
        "image": base[..., None],
        "labels_2d": labels_2d,
        "labels_res": labels_res,
        "valid_mask": valid_mask,
        "points": points,
        "points_valid": points_valid,
    }
    if cur_sem is not None:
        batch["sem"] = cur_sem

    if warped_pair and warped_pair.get("enable"):
        erosion = int(warped_pair.get("valid_border_margin", 0))
        H_fwd, H_inv, wclean, wpts, _, wmask, wsem = _warp_sample(
            k_pair, clean, points, points_valid, cur_sem,
            warped_pair.get("params") or {}, erosion, ignore_class,
            sem_warp_mode,
        )
        wimg = wclean
        if photometric and photometric.get("enable"):
            wimg = photometric_augment(
                k_photo2, wimg,
                primitives=photometric.get("primitives"),
                params=photometric.get("params"),
            )
        wlabels, wres = _labels_for(
            wpts, points_valid, shape, gaussian_label_sigma
        )
        batch.update(
            warped_image=wimg[..., None],
            warped_labels_2d=wlabels,
            warped_res=wres,
            warped_valid_mask=wmask,
            H_pair=H_fwd,
            H_pair_inv=H_inv,
        )
        if wsem is not None:
            batch["warped_sem"] = wsem
    return batch
