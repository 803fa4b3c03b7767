"""Gather-free projective image warping (two-pass resampling).

The gather-based bilinear warp (``ssp.core.warp.inv_warp_image``) runs
at ~100 M samples/s on TPU — per-pixel gathers don't vectorize on the
VPU and dominate homography-adaptation export (SURVEY.md §3.2's hot
loop).  This module implements the classical Catmull–Smith two-pass
decomposition instead: a projective warp factors into a vertical
resample (per column) followed by a horizontal resample (per row), and
each 1-D resample is expressed as a fused one-hot × reduce — pure
broadcast/compare/multiply/sum that XLA maps onto the VPU at full rate,
no gathers anywhere.

Robustness: the decomposition degenerates ("bottleneck problem") for
rotations near ±90°, so the homography's mean rotation is bucketed to
the nearest multiple of 90°; the exact 90° part is applied as an array
rotation (free layout op) and the two-pass handles only the ≤45°
residual.  Rectangular images are embedded in a square canvas (top-left,
zero pad) with the homography conjugated by the corresponding
normalized-coordinate affine, so the rotation branches share shapes.

Accuracy: bilinear-in-each-pass ≈ direct bilinear; differences are
sub-pixel interpolation details (validated against the gather warp in
tests).  Zero padding semantics match.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ssp.core.homography import inv3


def _rot_k(k: int) -> jnp.ndarray:
    """Rotation by k·90° in normalized square coords (x, y)."""
    c = [1.0, 0.0, -1.0, 0.0][k]
    s = [0.0, 1.0, 0.0, -1.0][k]
    return jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


# Opt-in: compute the coordinate grids inside the resample kernel
# (``_twopass_square_coef``) instead of as XLA [S, S] arrays.  Measured
# on v5e at 384×1248 × 20 warps: 12.12 ms vs 11.11 ms for the
# rows-array path — the per-tile rational/kill prologue costs more than
# the DMA'd precomputed rows, whose HBM traffic overlaps the band loop
# and whose XLA grids fuse/overlap upstream.  Kept (tested, vmap-safe)
# because it removes all [S, S] coordinate arrays — the right building
# block if a future shape is VMEM- or HBM-pressured — but OFF by
# default everywhere (parity + vmap tests force it explicitly).
COEF_GRIDS = False


def _use_pallas(size: int) -> bool:
    """Pallas resample on TPU (the kernel is TPU-Mosaic-only — on GPU
    the XLA einsum path is the correct fallback, not a lowering crash)
    when the square side satisfies the kernel's tile constraint."""
    return jax.default_backend() == "tpu" and (size <= 32 or size % 32 == 0)


def _vresample(img: jnp.ndarray, rows: jnp.ndarray) -> jnp.ndarray:
    """out[o, x] = img(rows[o, x], x), bilinear along axis 0, zero pad.

    img: [S, S(, C)]; rows: [S, S] in pixel units.  On TPU this routes
    to the Pallas on-the-fly-weights kernel
    (``ssp.kernels.vresample_pallas``) — the XLA one-hot einsum below
    materializes an [S, S, S] weight tensor and is HBM-bound.
    """
    if _use_pallas(img.shape[0]):
        from ssp.kernels.vresample_pallas import vresample_pallas

        if img.ndim == 2:
            return vresample_pallas(img, rows)
        return jnp.moveaxis(
            jax.vmap(vresample_pallas, in_axes=(2, None))(img, rows), 0, -1
        )
    S = img.shape[0]
    # int32-safe: a near-horizon pixel can put rows at 1e9+ where the
    # float->int cast is undefined and may alias a valid row with
    # weight 1.0 (fractional part underflows to 0); the kill value -10
    # and every in-range coordinate survive the clip untouched
    rows = jnp.clip(rows, -64.0, S + 64.0)
    y0 = jnp.floor(rows)
    fy = rows - y0
    y0i = y0.astype(jnp.int32)
    ii = jax.lax.broadcasted_iota(jnp.int32, (S, 1, 1), 0)  # [i, 1, 1]
    w = jnp.where(ii == y0i[None], 1.0 - fy[None], 0.0) + jnp.where(
        ii == y0i[None] + 1, fy[None], 0.0
    )  # [i, o, x]
    wb = w.astype(jnp.bfloat16)
    ib = img.astype(jnp.bfloat16)
    if img.ndim == 2:
        return jnp.einsum(
            "iox,ix->ox", wb, ib, preferred_element_type=jnp.float32
        )
    return jnp.einsum(
        "iox,ixc->oxc", wb, ib, preferred_element_type=jnp.float32
    )


def _hresample(img: jnp.ndarray, cols: jnp.ndarray) -> jnp.ndarray:
    """out[y, o] = img(y, cols[y, o]), bilinear along axis 1, zero pad."""
    if _use_pallas(img.shape[1]):
        from ssp.kernels.vresample_pallas import vresample_pallas

        # horizontal = vertical under transposition (layout ops are
        # cheap next to the resample)
        if img.ndim == 2:
            return vresample_pallas(img.T, cols.T).T
        return jnp.moveaxis(
            jax.vmap(lambda im: vresample_pallas(im.T, cols.T).T, in_axes=2)(img),
            0, -1,
        )
    S = img.shape[1]
    cols = jnp.clip(cols, -64.0, S + 64.0)
    x0 = jnp.floor(cols)
    fx = cols - x0
    x0i = x0.astype(jnp.int32)
    ii = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S), 2)  # [1, 1, i]
    w = jnp.where(ii == x0i[..., None], 1.0 - fx[..., None], 0.0) + jnp.where(
        ii == x0i[..., None] + 1, fx[..., None], 0.0
    )  # [y, o, i]
    wb = w.astype(jnp.bfloat16)
    ib = img.astype(jnp.bfloat16)
    if img.ndim == 2:
        return jnp.einsum(
            "yoi,yi->yo", wb, ib, preferred_element_type=jnp.float32
        )
    return jnp.einsum(
        "yoi,yic->yoc", wb, ib, preferred_element_type=jnp.float32
    )


def _twopass_square(
    img: jnp.ndarray,
    Hm: jnp.ndarray,
    keep1: Optional[jnp.ndarray] = None,
    keep2: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """out(p) = img(Hm·p) on a square [S, S(, C)] canvas, |rotation|≲45°.

    ``keep1 [S]`` / ``keep2 [S, S]`` mark which pass-1 output rows /
    pass-2 output pixels are actually consumed downstream (the caller
    crops to the content rectangle after the rotation un-bucketing);
    coordinates outside are set to the kill value so the Pallas
    resample's per-tile source band is empty and the tile costs ~zero.
    On a 384×1248 image the square canvas is 3.25× the content — the
    crop-aware kill recovers most of that tax (measured below).

    Derivation: with Hm = [[a,b,c],[d,e,f],[g,h,i]] mapping output
    normalized (x, y) to source (u, v):

      pass 2 (horizontal): out(x, y) = tmp(u(x, y), y)
      pass 1 (vertical):   tmp(x', y) = img(x', v₁(x', y))

    where v₁(x', y) = v(x(x', y), y) and x(x', y) solves u(x, y) = x':
      x = (b·y + c − x'·(h·y + i)) / (x'·g − a)
    """
    S = img.shape[0]
    a, b, c = Hm[0, 0], Hm[0, 1], Hm[0, 2]
    d, e, f = Hm[1, 0], Hm[1, 1], Hm[1, 2]
    g, h, i = Hm[2, 0], Hm[2, 1], Hm[2, 2]

    lin = jnp.linspace(-1.0, 1.0, S)
    to_pix = (S - 1) / 2.0

    # ---- pass 1: vertical resample.  grid over (x', y_out)
    xp = lin[None, :]  # [1, S]  (columns = x')
    yo = lin[:, None]  # [S, 1]
    denom = xp * g - a
    denom = jnp.where(jnp.abs(denom) < 1e-8, 1e-8, denom)
    x_src = (b * yo + c - xp * (h * yo + i)) / denom
    wsrc = g * x_src + h * yo + i
    v1 = (d * x_src + e * yo + f) / jnp.where(jnp.abs(wsrc) < 1e-8, 1e-8, wsrc)
    rows = (v1 + 1.0) * to_pix
    # kill rows where the solve ran away (x far outside the canvas)
    rows = jnp.where(jnp.abs(x_src) <= 1.5, rows, -10.0)
    if keep1 is not None:
        rows = jnp.where(keep1[:, None], rows, -10.0)
    tmp = _vresample(img, rows)

    # ---- pass 2: horizontal resample.  grid over (y, x_out)
    xo = lin[None, :]
    yy = lin[:, None]
    w2 = g * xo + h * yy + i
    u = (a * xo + b * yy + c) / jnp.where(jnp.abs(w2) < 1e-8, 1e-8, w2)
    cols = (u + 1.0) * to_pix
    if keep2 is not None:
        cols = jnp.where(keep2, cols, -10.0)
    return _hresample(tmp, cols)


def _pass_coefs(Hm: jnp.ndarray, rlo, rhi, clo, chi, S: int):
    """Closed-form bilinear-rational coefficients for both passes.

    With Hm = [[a,b,c],[d,e,f],[g,h,i]] (output normalized (x, y) →
    source (u, v)), pass 1's source row on the (output-row o = y,
    column x = x') grid is v₁ = N/D with

      N = (dc−af) + (fg−di)·x' + (db−ae)·y + (eg−dh)·x'y
      D = (gc−ai) + (gb−ah)·y                      (x'-independent)

    (substituting the pass-1 solve x_src = (by+c−x'(hy+i))/(gx'−a)
    into v = (dx+ey+f)/(gx+hy+i); verified to fp64 round-off).  The
    runaway-solve kill |x_src| > 1.5 becomes the divide-free
    |by+c−x'(hy+i)| > 1.5·|gx'−a|.  Pass 2 runs the same kernel on the
    transposed intermediate, so on its (o = x_out, x = y) grid the
    source column is u = (c + b·y + a·x_out)/(i + h·y + g·x_out).

    Returns two [20] coefficient vectors (num 4, den 4, kill_num 4,
    kill_den 4, keep bounds 4) for ``vresample_coef_pallas``.
    """
    a, b, c = Hm[0, 0], Hm[0, 1], Hm[0, 2]
    d, e, f = Hm[1, 0], Hm[1, 1], Hm[1, 2]
    g, h, i = Hm[2, 0], Hm[2, 1], Hm[2, 2]
    z = jnp.zeros(())
    one = jnp.ones(())
    Sf = jnp.float32(S)
    coef1 = jnp.stack([
        d * c - a * f, f * g - d * i, d * b - a * e, e * g - d * h,
        g * c - a * i, z, g * b - a * h, z,
        c, -i, b, -h,
        -a, g, z, z,
        rlo, rhi, z, Sf,
    ]).astype(jnp.float32)
    coef2 = jnp.stack([
        c, b, a, z,
        i, h, g, z,
        z, z, z, z,
        one, z, z, z,
        clo, chi, rlo, rhi,
    ]).astype(jnp.float32)
    return coef1, coef2


def _twopass_square_coef(img: jnp.ndarray, Hm: jnp.ndarray,
                         rlo, rhi, clo, chi,
                         interpret: bool = False) -> jnp.ndarray:
    """``_twopass_square`` with the coordinate grids computed inside
    the Pallas resample kernel (TPU path; [S, S] single channel).

    Skips the four XLA [S, S] rational grids and their HBM round trips
    per warp — the per-tile coordinates are rebuilt from 20 scalars in
    registers (see ``_pass_coefs``).
    """
    from ssp.kernels.vresample_pallas import vresample_coef_pallas

    S = img.shape[0]
    coef1, coef2 = _pass_coefs(Hm, rlo, rhi, clo, chi, S)
    tmp = vresample_coef_pallas(img, coef1, interpret=interpret)
    return vresample_coef_pallas(tmp.T, coef2, interpret=interpret).T


def _mean_rotation_bucket(Hm: jnp.ndarray) -> jnp.ndarray:
    """Nearest multiple of 90° of the homography's mean rotation."""
    Hn = Hm / Hm[2, 2]
    theta = jnp.arctan2(Hn[1, 0] - Hn[0, 1], Hn[0, 0] + Hn[1, 1])
    return jnp.mod(jnp.round(theta / (jnp.pi / 2)).astype(jnp.int32), 4)


@partial(jax.jit, static_argnames=())
def inv_warp_image_twopass(img: jnp.ndarray, Hm: jnp.ndarray) -> jnp.ndarray:
    """Drop-in twin of ``ssp.core.warp.inv_warp_image`` (bilinear).

    img: [H, W] or [H, W, C]; Hm: [3, 3] acting on [-1, 1]² normalized
    output coords (align-corners convention).
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H_px, W_px = img.shape[0], img.shape[1]
    S = max(H_px, W_px)
    if jax.default_backend() == "tpu" and S > 128:
        # round the canvas to a 128 multiple: the Pallas resample then
        # x-tiles at lane width (bounded source bands), and the extra
        # padding is dead-on-arrival under the crop-aware kill masks
        S = -(-S // 128) * 128

    # embed into a square canvas (top-left) and conjugate Hm with the
    # affine between canvas-normalized and image-normalized coords:
    # x_img = s_x·x_canvas + (s_x − 1),  s_x = (S−1)/(W−1)
    sx = (S - 1) / (W_px - 1)
    sy = (S - 1) / (H_px - 1)
    T = jnp.array([[sx, 0.0, sx - 1.0], [0.0, sy, sy - 1.0], [0.0, 0.0, 1.0]])
    Hc = inv3(T) @ Hm @ T
    canvas = jnp.pad(img, ((0, S - H_px), (0, S - W_px), (0, 0)))

    k = _mean_rotation_bucket(Hc)

    # Hres = Hc ∘ Rk⁻¹ via a table lookup — no control flow, so under
    # vmap the *expensive* two-pass below runs exactly once per warp.
    # (A lax.switch around the whole computation would execute all four
    # branches under vmap and select — a 4× tax on the resampling.)
    rk_inv = jnp.stack([_rot_k((4 - kk) % 4) for kk in range(4)])  # [4,3,3]
    Hres = Hc @ rk_inv[k]

    # crop-aware kill masks: the final ``rot90(mid, k)[:H, :W]`` crop
    # consumes only a content rectangle of ``mid`` (k=0: rows<H, cols<W;
    # k=1: rows<W, cols≥S−H; k=2: rows≥S−H, cols≥S−W; k=3: rows≥S−W,
    # cols<H).  Everything else is dead work on the padded square
    # canvas — marking those outputs killed lets the Pallas resample's
    # per-tile band go empty, so the tiles cost ~nothing (at 384×1248
    # the canvas is 3.25× the content).  Table-indexed by k, like the
    # homography — no control flow under vmap.
    rlo = jnp.array([0, 0, S - H_px, S - W_px])[k]
    rhi = jnp.array([H_px, W_px, S, S])[k]
    clo = jnp.array([0, S - H_px, S - W_px, 0])[k]
    chi = jnp.array([W_px, S, S, H_px])[k]
    if COEF_GRIDS and _use_pallas(S) and canvas.shape[-1] == 1:
        # coordinate grids computed inside the kernel — no [S, S] XLA
        # rational grids, no rows/cols HBM arrays (see _pass_coefs)
        mid = _twopass_square_coef(
            canvas[..., 0], Hres, rlo, rhi, clo, chi
        )[..., None]
    else:
        ar = jnp.arange(S)
        keep1 = (ar >= rlo) & (ar < rhi)
        keep2 = keep1[:, None] & (ar[None, :] >= clo) & (ar[None, :] < chi)
        mid = _twopass_square(canvas, Hres, keep1=keep1, keep2=keep2)

    # out(p) = mid(Rk·p): with Rk the CCW rotation of normalized coords,
    # out[i, j] = mid[j, S-1-i] for k=1 — exactly jnp.rot90(mid, k) on
    # the array axes.  Only these cheap layout ops are branched.
    out = jax.lax.switch(
        k, [lambda m, kk=kk: jnp.rot90(m, k=kk, axes=(0, 1)) for kk in range(4)], mid
    )
    out = out[:H_px, :W_px]
    return out[..., 0] if squeeze else out
