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


def _vres_coef_kernel(img_ref, coef_ref, ob_ref, xb_ref, out_ref, *, s_img):
    """Band-limited vertical resample with the source coordinates
    computed IN KERNEL from a bilinear-rational closed form.

    For a projective warp both two-pass coordinate grids are
    (bilinear in (o, x)) / (bilinear in (o, x)) — see
    ``warp_twopass._pass_coefs`` for the derivation — so instead of
    materializing a [S, S] ``rows`` array in HBM (plus the XLA divide
    grids that build it), each tile rebuilds its own coordinates from
    20 scalars: 4 numerator + 4 denominator coefficients for the
    value, the same for the kill test (|k_num| > 1.5·|k_den|, a
    divide-free rewrite of pass 1's |x_src| > 1.5), and 4 keep bounds.
    Pass 1's denominator is x-independent (d·(by+c−x'(hy+i)) +
    (ey+f)(x'g−a) over g·c−a·i + (g·b−a·h)·y), so its divide grid is
    effectively 1-D.

    Tile offsets arrive as grid-indexed blocks of global iota vectors
    (``ob [to, 1]`` rows, ``xb [1, tx]`` cols) instead of
    ``pl.program_id`` so the kernel stays vmap-safe: Pallas's batching
    rule prepends the batch axis to the grid, which would silently
    re-aim program_id axis indices (and SMEM scalar blocks fail the
    batched block-shape constraint).
    """
    c = lambda j: coef_ref[0, j]
    half = (s_img - 1) / 2.0
    # global row/col indices of this tile (broadcasting [to,1]×[1,tx])
    io = ob_ref[:]  # [to, 1]
    ix = xb_ref[:]  # [1, tx]
    Lo = io / half - 1.0
    Lx = ix / half - 1.0
    num = c(0) + c(1) * Lx + (c(2) + c(3) * Lx) * Lo
    den = c(4) + c(5) * Lx + (c(6) + c(7) * Lx) * Lo
    den = jnp.where(jnp.abs(den) < 1e-8, 1e-8, den)
    rows = (num / den + 1.0) * half
    knum = c(8) + c(9) * Lx + (c(10) + c(11) * Lx) * Lo
    kden = c(12) + c(13) * Lx + (c(14) + c(15) * Lx) * Lo
    keep = (
        (jnp.abs(knum) <= 1.5 * jnp.abs(kden))
        & (io >= c(16)) & (io < c(17)) & (ix >= c(18)) & (ix < c(19))
    )
    rows = jnp.where(keep, jnp.clip(rows, -64.0, s_img + 64.0), KILL)

    valid = rows > (KILL + 5.0)
    rlo = jnp.min(jnp.where(valid, rows, jnp.inf)) - 1.0
    rhi = jnp.max(jnp.where(valid, rows, -jnp.inf)) + 1.0
    lo = jnp.clip(jnp.floor(rlo), 0.0, float(s_img)).astype(jnp.int32)
    hi = jnp.clip(jnp.ceil(rhi) + 1.0, 0.0, float(s_img)).astype(jnp.int32)
    lo = (lo // UNROLL) * UNROLL
    trips = (hi - lo + UNROLL - 1) // UNROLL

    def body(t, acc):
        i0 = lo + t * UNROLL
        contrib = jnp.zeros(acc.shape, acc.dtype)
        for d in range(UNROLL):
            i = i0 + d
            w = jnp.maximum(0.0, 1.0 - jnp.abs(rows - i.astype(jnp.float32)))
            w = jnp.where(i < s_img, w, 0.0)
            row = img_ref[pl.ds(jnp.minimum(i, s_img - 1), 1), :]
            contrib = contrib + w * row
        return acc + contrib

    out_ref[:] = jax.lax.fori_loop(
        0, trips, body, jnp.zeros(out_ref.shape, out_ref.dtype)
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def vresample_coef_pallas(
    img: jnp.ndarray, coefs: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """out[o, x] = img(rows(o, x), x) with rows computed in kernel.

    img: [S, S] float32; coefs: [20] float32 —
    ``[num(4), den(4), kill_num(4), kill_den(4), olo, ohi, xlo, xhi]``,
    each quadruple ``(c00, c·x, c·o, c·ox)`` over normalized [-1, 1]
    coords.  vmap-safe over either or both args (warps against a
    shared canvas, or per-warp images on the back-warp).
    """
    S = img.shape[0]
    to = min(TILE_O, S)
    assert S % to == 0, f"S={S} must be a multiple of {to}"
    tx = TILE_X if S % TILE_X == 0 else S
    obase = jnp.arange(S, dtype=jnp.float32)[:, None]   # [S, 1]
    xbase = jnp.arange(S, dtype=jnp.float32)[None, :]   # [1, S]
    kernel = functools.partial(_vres_coef_kernel, s_img=S)
    return pl.pallas_call(
        kernel,
        grid=(S // tx, S // to),
        in_specs=[
            pl.BlockSpec((S, tx), lambda x, o: (0, x), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 20), lambda x, o: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((to, 1), lambda x, o: (o, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tx), lambda x, o: (0, x), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((to, tx), lambda x, o: (o, x), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, S), jnp.float32),
        interpret=interpret,
    )(img.astype(jnp.float32), coefs.astype(jnp.float32)[None, :],
      obase, xbase)


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
