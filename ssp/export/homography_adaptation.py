"""Homography-adaptation pseudo-label export — the north-star workload.

Reference pipeline (``export.py:192-352`` + ``datasets/Coco.py:258-291``):
for each image, CPU workers build a 100-warp stack, a DataParallel
forward produces heatmaps, ``combine_heatmap`` (``export.py:49-59``)
masks them, warps them back, and aggregates Σheat/Σmask; NMS + top-k
selects pseudo-label keypoints written as npz.

TPU-native redesign: the *entire* chain — homography sampling, warping,
the batched forward, inverse warping, aggregation, NMS, top-k — is one
jitted function per image, vmapped over a group of images and sharded
over the device mesh by image.  The host only decodes images and writes
npz.  No CPU warps, no per-warp host round trips: per image the device
sees one [num_H, H, W, 1] conv batch (MXU) plus two gather-warps (VPU).
"""

from __future__ import annotations

import logging
from functools import partial
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssp.core.grid import flatten_detection
from ssp.core.homography import sample_homographies
from ssp.core.warp import compute_valid_mask, inv_warp_image
from ssp.postprocess.points import extract_keypoints, soft_argmax_refine

log = logging.getLogger(__name__)

DEFAULT_HA = {
    "num": 100,
    "aggregation": "sum",
    "filter_counts": 0,
    "homographies": {
        "params": {
            "translation": True,
            "rotation": True,
            "scaling": True,
            "perspective": True,
            "scaling_amplitude": 0.2,
            "perspective_amplitude_x": 0.2,
            "perspective_amplitude_y": 0.2,
            "allow_artifacts": True,
            "patch_ratio": 0.85,
        }
    },
}


def make_ha_fn(
    apply_fn: Callable,
    variables: Dict[str, Any],
    *,
    num_h: int = 100,
    homography_params: Optional[Dict[str, Any]] = None,
    erosion_radius: int = 3,
    aggregation: str = "sum",
    filter_counts: int = 0,
    top_k: int = 600,
    conf_thresh: float = 0.015,
    nms_radius: int = 4,
    subpixel: bool = False,
    patch_size: int = 5,
    chunk: int = 25,
):
    """Build the jitted per-image HA function.

    Returns ``ha(key, image [H, W]) → (pts [top_k, 3], valid [top_k])``
    with pts = (x, y, score).  vmap/shard it over images.

    Memory shape: the 100-warp stack's conv activations would be ~1 GB+
    per image at 240×320 (and 4× that at 480×640), so the warp batch is
    processed in ``chunk``-sized slices via ``lax.map`` with running
    sum/max accumulators — peak activation memory is bounded by one
    chunk while the MXU still sees well-sized conv batches.
    """
    h_params = dict(homography_params or DEFAULT_HA["homographies"]["params"])
    assert num_h % chunk == 0 or num_h < chunk, (num_h, chunk)
    chunk = min(chunk, num_h)

    def ha_one(key: jax.Array, image: jnp.ndarray):
        H_img, W_img = image.shape

        # num_h-1 random warps + identity in slot 0 (reference sets
        # H[0]=I, datasets/Coco.py:271)
        Hs = sample_homographies(key, num_h - 1, shift=-1.0, **h_params)
        Hs = jnp.concatenate([jnp.eye(3)[None], Hs], axis=0)  # [N, 3, 3]
        Hs_inv = jnp.linalg.inv(Hs)

        def process_chunk(h_pair):
            h_c, h_inv_c = h_pair  # [chunk, 3, 3] each
            # warp the image into the stack: content map original→warped
            # is inv(Hs) under inv_warp_image(img, Hs)
            imgs = jax.vmap(lambda Hm: inv_warp_image(image[..., None], Hm))(h_c)
            masks = jax.vmap(
                lambda Hm: compute_valid_mask((H_img, W_img), Hm, erosion_radius)
            )(h_c)
            out = apply_fn(variables, imgs, train=False)
            heat = flatten_detection(out["semi"])[..., 0] * masks
            # back to the original frame: sample warped frame at inv(H)(q)
            back = jax.vmap(
                lambda h, Hm: inv_warp_image(h[..., None], Hm)[..., 0]
            )(heat, h_inv_c)
            mask_back = jax.vmap(
                lambda m, Hm: inv_warp_image(m[..., None], Hm)[..., 0]
            )(masks, h_inv_c)
            return (
                jnp.sum(back, axis=0),
                jnp.max(back, axis=0),
                jnp.sum(mask_back, axis=0),
            )

        n_chunks = num_h // chunk
        sums, maxs, counts = jax.lax.map(
            process_chunk,
            (
                Hs.reshape(n_chunks, chunk, 3, 3),
                Hs_inv.reshape(n_chunks, chunk, 3, 3),
            ),
        )
        total = jnp.sum(sums, axis=0)
        counts = jnp.sum(counts, axis=0)
        if aggregation == "max":
            agg = jnp.max(maxs, axis=0)
        else:  # "sum" (mean over contributing warps)
            agg = total / (counts + 1e-6)
        if filter_counts > 0:
            # drop pixels observed by too few warps (reference HA spec,
            # models/homographies.py:87-99)
            agg = jnp.where(counts >= filter_counts, agg, 0.0)

        pts, valid = extract_keypoints(
            agg, k=top_k, conf_thresh=conf_thresh, nms_radius=nms_radius
        )
        if subpixel:
            pts = soft_argmax_refine(agg, pts, patch_size)
        return pts, valid

    return jax.jit(ha_one)


def run_ha_export(
    ha_fn,
    images: Iterable[Tuple[str, np.ndarray]],
    out_dir: Path,
    *,
    seed: int = 0,
    group: int = 1,
) -> int:
    """Drive the export: iterate (name, image) pairs, skip existing npz
    (restartability — reference ``export.py:297-301``), write
    ``<name>.npz`` with ``pts [N, 3]`` (x, y, score).

    ``group`` > 1 processes several images per device dispatch (vmapped)
    when their shapes match — use the mesh batch dimension to shard.
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    count = 0
    key = jax.random.key(seed)

    pending: list = []

    vmapped = jax.jit(jax.vmap(ha_fn)) if group > 1 else None

    def flush(pending):
        nonlocal count
        if not pending:
            return
        if len(pending) == 1 or vmapped is None:
            for name, img, k in pending:
                pts, valid = ha_fn(k, jnp.asarray(img))
                _write(out_dir / f"{name}.npz", pts, valid)
                count += 1
        else:
            keys = jnp.stack([k for _, _, k in pending])
            imgs = jnp.stack([jnp.asarray(i) for _, i, _ in pending])
            pts_b, valid_b = vmapped(keys, imgs)
            for (name, _, _), pts, valid in zip(pending, pts_b, valid_b):
                _write(out_dir / f"{name}.npz", pts, valid)
                count += 1
        pending.clear()

    for name, img in images:
        out_file = out_dir / f"{name}.npz"
        if out_file.exists():
            continue
        key, sub = jax.random.split(key)
        pending.append((name, img, sub))
        if len(pending) >= group:
            flush(pending)
    flush(pending)
    return count


def _write(path: Path, pts, valid) -> None:
    pts = np.asarray(jax.device_get(pts))
    valid = np.asarray(jax.device_get(valid))
    np.savez_compressed(path, pts=pts[valid])
