"""Fused iterative-NMS Pallas kernel.

``ssp.postprocess.nms.simple_nms`` lowers to ~5 ``reduce_window`` max
pools; each round-trips the [B, H, W] heatmap through HBM.  This kernel
runs the whole suppression chain — separable window maxes via unrolled
shift/maximum on the VPU — over row tiles held in VMEM: one HBM read
and one write per pixel instead of ten.

Tiling: the iterative algorithm's receptive field is
``radius·(2·iterations − 1)`` rows, so each (TILE, W) core is computed
from a (TILE + 2·HALO, W) window DMA'd from HBM.  Window starts are
clamped into the image, which both supplies real interior context and
reproduces -inf edge padding via the in-register shift fills (whole
image ≈ 1.2 MB would fit VMEM, but the unrolled chain's ~12 live
temporaries would not — hence tiles).

Numerically identical to the XLA path (max/compare only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
TILE = 128


def _shift_with_pad(x: jnp.ndarray, s: int, axis: int, fill: float) -> jnp.ndarray:
    """Shift x by s along axis (positive s moves content toward higher
    indices), filling vacated positions with ``fill``."""
    size = x.shape[axis]
    # pltpu.roll requires non-negative shifts; negative = size + s
    rolled = pltpu.roll(x, s if s >= 0 else size + s, axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=axis)
    if s >= 0:
        mask = idx >= s
    else:
        mask = idx < size + s
    return jnp.where(mask, rolled, fill)


def _window_max(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Separable (2r+1)² window max of a [H, W] block.

    (A log₂-step doubling chain was tried and reverted: the linear
    chain's NEG-padded *partial* windows at image borders need an
    independent backward pass to reproduce, which costs 7 shift+max
    passes per axis vs 8 — not worth diverging from the oracle.)
    """
    row = x
    for s in range(1, radius + 1):
        row = jnp.maximum(row, _shift_with_pad(x, s, 1, NEG))
        row = jnp.maximum(row, _shift_with_pad(x, -s, 1, NEG))
    out = row
    for s in range(1, radius + 1):
        out = jnp.maximum(out, _shift_with_pad(row, s, 0, NEG))
        out = jnp.maximum(out, _shift_with_pad(row, -s, 0, NEG))
    return out


def _suppress(scores: jnp.ndarray, radius: int, iterations: int) -> jnp.ndarray:
    zeros = jnp.zeros_like(scores)
    max_mask = scores == _window_max(scores, radius)
    for _ in range(iterations - 1):
        supp = _window_max(max_mask.astype(scores.dtype), radius) > 0
        supp_scores = jnp.where(supp, zeros, scores)
        new_max = supp_scores == _window_max(supp_scores, radius)
        max_mask = max_mask | (new_max & ~supp)
    return jnp.where(max_mask, scores, zeros)


def _border_mask(x: jnp.ndarray, row0, border: int, h_valid: int, w_valid: int):
    """Zero detections within ``border`` px of the (unpadded) image edge;
    ``row0`` is the block's absolute first row."""
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    ok = (
        (rows >= border) & (rows < h_valid - border)
        & (cols >= border) & (cols < w_valid - border)
    )
    return jnp.where(ok, x, jnp.zeros_like(x))


def _nms_kernel_tiled(
    scores_hbm, out_ref, scratch, result_ref, sem, *, radius, iterations, halo,
    h_img, border, h_valid, w_valid,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    ext = scratch.shape[0]
    # all three operands of the clip are 8-row aligned → so is start
    start = pl.multiple_of(jnp.clip(t * TILE - halo, 0, h_img - ext), 8)
    copy = pltpu.make_async_copy(
        scores_hbm.at[b, pl.ds(start, ext), :], scratch, sem
    )
    copy.start()
    copy.wait()
    result_ref[:] = _suppress(scratch[:], radius, iterations)
    # dynamic-start read through a ref (Mosaic lacks array dynamic_slice);
    # halo and the clip bound are 8-row aligned, so the start is too
    offset = pl.multiple_of(t * TILE - start, 8)
    core = result_ref[pl.ds(offset, TILE), :]
    if border:
        core = _border_mask(core, t * TILE, border, h_valid, w_valid)
    out_ref[:] = core


def _nms_kernel_whole(scores_ref, out_ref, *, radius, iterations, border,
                      h_valid, w_valid):
    out = _suppress(scores_ref[:], radius, iterations)
    if border:
        out = _border_mask(out, 0, border, h_valid, w_valid)
    out_ref[:] = out


@functools.partial(
    jax.jit, static_argnames=("radius", "iterations", "border", "interpret")
)
def nms_pallas(
    scores: jnp.ndarray, radius: int = 4, iterations: int = 3,
    border: int = 0, interpret: bool = False,
) -> jnp.ndarray:
    """scores [B, H, W] (or [H, W]) → suppressed heatmap, same shape.

    ``border > 0`` additionally zeroes detections within ``border``
    pixels of the image edge inside the kernel (fuses the reference's
    ``border_remove`` pass, ``model_wrap.py:266-293``, saving a full
    [B, H, W] HBM round-trip in the detect+describe pipeline).
    """
    squeeze = scores.ndim == 2
    if squeeze:
        scores = scores[None]
    B, H, W = scores.shape
    halo = radius * (2 * iterations - 1)
    halo = ((halo + 7) // 8) * 8  # sublane-align so the shifted core
    ext = TILE + 2 * halo         # read starts on an 8-row boundary

    # pad rows to a TILE multiple and lanes to 128 (zero rows/columns
    # can't create or suppress detections for non-negative heatmaps) so
    # big images take the tiled path and DMA slices stay lane-aligned
    H_orig, W_orig = H, W
    if H >= ext and H % TILE != 0:
        scores = jnp.pad(scores, ((0, 0), (0, TILE - H % TILE), (0, 0)))
        H = scores.shape[1]
    if H >= ext and W % 128 != 0:
        scores = jnp.pad(scores, ((0, 0), (0, 0), (0, 128 - W % 128)))
        W = scores.shape[2]

    if H < ext or H % TILE != 0:
        # small or ragged heights: single whole-image block per program
        kernel = functools.partial(
            _nms_kernel_whole, radius=radius, iterations=iterations,
            border=border, h_valid=H_orig, w_valid=W_orig,
        )
        out = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((None, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec(
                (None, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, H, W), scores.dtype),
            interpret=interpret,
        )(scores)
    else:
        kernel = functools.partial(
            _nms_kernel_tiled,
            radius=radius, iterations=iterations, halo=halo, h_img=H,
            border=border, h_valid=H_orig, w_valid=W_orig,
        )
        out = pl.pallas_call(
            kernel,
            grid=(B, H // TILE),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(
                (None, TILE, W), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, H, W), scores.dtype),
            scratch_shapes=[
                pltpu.VMEM((ext, W), scores.dtype),
                pltpu.VMEM((ext, W), scores.dtype),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(scores)
    out = out[:, :H_orig, :W_orig]
    return out[0] if squeeze else out
