"""Pallas vertical-resample kernel with on-the-fly bilinear weights.

The XLA two-pass warp (``ssp.kernels.warp_twopass``) expresses each 1-D
resample as a one-hot × reduce einsum whose [S, S, S] weight tensor gets
materialized — ~65 MB of HBM write+read per pass per warp, which makes
homography-adaptation export HBM-bound (PERF.md bottleneck #1).  This
kernel computes the weights in registers instead:

  out[o, x] = Σ_i max(0, 1 − |rows[o, x] − i|) · img[i, x]

The hat function max(0, 1−|r−i|) IS bilinear interpolation along the
source-row axis (weight 1−fy at ⌊r⌋, fy at ⌊r⌋+1, 0 elsewhere) with
zero padding outside [0, S−1] for free.

Performance structure (measured on v5e):
  * output is tiled [TILE_O, S] so the rows tile and the accumulator
    are small enough to live in vector registers across the whole
    source loop — a whole-image accumulator forces ~1 MB of VMEM
    round-trips per source row and is VMEM-bandwidth-bound;
  * the source loop runs only over the tile's dynamic band
    [min rows − 1, max rows + 1] — for scale/translation-dominant
    homographies the band is a few dozen rows instead of S;
  * the loop body is unrolled UNROLL× with a single accumulator update
    per trip.

The horizontal pass reuses this kernel under transposes (a [S, S]
transpose is a cheap layout op next to the resample itself).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

UNROLL = 8
TILE_O = 32
TILE_X = 128
KILL = -10.0  # rows value marking "no source" (warp_twopass uses -10)


def _vres_kernel(img_ref, rows_ref, out_ref, *, s_img):
    rows = rows_ref[:]  # [TILE_O, S] — register-resident across the loop
    valid = rows > (KILL + 5.0)
    rlo = jnp.min(jnp.where(valid, rows, jnp.inf)) - 1.0
    rhi = jnp.max(jnp.where(valid, rows, -jnp.inf)) + 1.0
    lo = jnp.clip(jnp.floor(rlo), 0.0, float(s_img)).astype(jnp.int32)
    hi = jnp.clip(jnp.ceil(rhi) + 1.0, 0.0, float(s_img)).astype(jnp.int32)
    lo = (lo // UNROLL) * UNROLL
    trips = (hi - lo + UNROLL - 1) // UNROLL

    def body(c, acc):
        i0 = lo + c * UNROLL
        contrib = jnp.zeros(acc.shape, acc.dtype)
        for d in range(UNROLL):
            i = i0 + d
            w = jnp.maximum(0.0, 1.0 - jnp.abs(rows - i.astype(jnp.float32)))
            # unroll overshoot guard: clamping the row read to the last
            # image row without zeroing the weight would double-count it
            # whenever the band end isn't a multiple of UNROLL
            w = jnp.where(i < s_img, w, 0.0)
            row = img_ref[pl.ds(jnp.minimum(i, s_img - 1), 1), :]
            contrib = contrib + w * row
        return acc + contrib

    out_ref[:] = jax.lax.fori_loop(
        0, trips, body, jnp.zeros(out_ref.shape, out_ref.dtype)
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def vresample_pallas(
    img: jnp.ndarray, rows: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """out[o, x] = img(rows[o, x], x) — bilinear along axis 0, zero pad.

    img: [S, S] float32; rows: [S, S] float32 pixel units (values below
    −5 contribute nothing).  vmap-safe: vmapping prepends a grid dim.
    """
    S = img.shape[0]
    to = min(TILE_O, S)
    assert S % to == 0, f"S={S} must be a multiple of {to}"
    # 2-D tiling: the source band a tile must scan is set by how much
    # ``rows`` varies ACROSS the tile, and for a rotation θ the
    # variation along x is ~tanθ·width — with full-width tiles a 20°
    # warp at S=1280 scans ~450 source rows per tile.  Splitting x into
    # 128-lane strips bounds the band by ~tanθ·128 instead (measured
    # 2.5× on the 384×1248 KITTI warp stack).  x is the OUTER grid dim
    # so the [S, TILE_X] image strip is revisited, not re-fetched,
    # across the o-tiles that share it.
    tx = TILE_X if S % TILE_X == 0 else S
    kernel = functools.partial(_vres_kernel, s_img=S)
    return pl.pallas_call(
        kernel,
        grid=(S // tx, S // to),
        in_specs=[
            pl.BlockSpec((S, tx), lambda x, o: (0, x), memory_space=pltpu.VMEM),
            pl.BlockSpec((to, tx), lambda x, o: (o, x), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((to, tx), lambda x, o: (o, x), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, S), jnp.float32),
        interpret=interpret,
    )(img.astype(jnp.float32), rows.astype(jnp.float32))
