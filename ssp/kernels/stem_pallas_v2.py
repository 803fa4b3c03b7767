"""Fused SuperPoint stem, v2: x-pair-packed conv1b at full MXU lanes.

Second swing at the inference hot spot (reference
``models/SuperPointNet_gauss2.py:19-22`` — conv1a 1→64, conv1b 64→64 at
full resolution ≈ 44% of forward FLOPs).  The v1 kernel
(``stem_pallas.py``) lost to XLA (11.5 vs 7.2 ms at 480×640×16): its
3-shift-variant structure computes conv1a three times and every conv1b
dot leaves N=64 — half the v5e's 128 output lanes idle.

v2 changes the data layout instead of the schedule: **two adjacent
output pixels' 64 channels share one 128-lane tile** ("x-pair
packing").  Consequences:

- conv1a is computed ONCE, directly in packed form, as a single
  K=12-tap matmul producing ``[rows, W/2, 128]`` — the taps come from
  host-pre-split even/odd column planes of the single-channel input,
  so every shift is a cheap full-width lane roll (v1's trick, without
  the 3× variant tax).
- conv1b consumes the packed activation with ONE ``[T, W/2, 768] @
  [768, 128]`` dot per tile: the union 3×4 input window of a pixel
  pair is 6 chunk-pairs of 128 channels (three dy rows × {in-place,
  neighbour} pixel pairs), giving K = 768 fully dense in the array and
  N = 128 fully used, at 75% weight density (the 12/9 union-window
  redundancy).  MXU pass count per pixel drops from ~6 (v1) / ~4.5
  (XLA's N=64 ceiling) to 3.
- The neighbour chunk ((2q−1, 2q+2) pixels) is built from the packed
  activation with one 64-lane rotate + two sublane rolls + selects —
  no strided shuffles.

Output is packed ``[B, H, W/2, 128]``; ``jnp.reshape`` to
``[B, H, W, 64]`` is the row-major unpack (exact, no data movement in
value semantics).  Inference BatchNorm folds into per-channel
scale/bias epilogues (``stem_pallas.fold_bn``).  Requires H % 16 == 0,
W % 16 == 0 (SuperPoint resolutions hold: 480×640, 240×320, 384×1248).

Measured on v5e at 480×640×16 (PERF.md "stem v2"): see PERF — the
honest comparison against XLA's fused DoubleConv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 64      # stem width
LANE = 128  # v5e lane count = packed channel dim (2 pixels × 64)
T = 16      # output rows per program
XROWS = 24  # input rows DMA'd per program (covers T+4, 8-aligned)


def _pack_w1(w1: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, 1, 64] → [16, 128] packed conv1a weights.

    Tap rows (dy·4 + k): k=0 ``odd[q−1]`` (pixel 2q−1), k=1 ``even[q]``
    (2q), k=2 ``odd[q]`` (2q+1), k=3 ``even[q+1]`` (2q+2); rows 12:16
    zero pad (sublane alignment).  Columns 0:64 = even output pixel 2q
    (window 2q−1..2q+1), 64:128 = odd output 2q+1 (window 2q..2q+2).
    """
    w = w1.reshape(3, 3, C).astype(jnp.float32)  # [dy, dx, cout]
    out = jnp.zeros((16, 2 * C), jnp.float32)
    for dy in range(3):
        r = dy * 4
        out = out.at[r + 0, :C].set(w[dy, 0])        # 2q−1 → even out, d=−1
        out = out.at[r + 1, :C].set(w[dy, 1])        # 2q   → even out, d=0
        out = out.at[r + 1, C:].set(w[dy, 0])        # 2q   → odd out,  d=−1
        out = out.at[r + 2, :C].set(w[dy, 2])        # 2q+1 → even out, d=+1
        out = out.at[r + 2, C:].set(w[dy, 1])        # 2q+1 → odd out,  d=0
        out = out.at[r + 3, C:].set(w[dy, 2])        # 2q+2 → odd out,  d=+1
    return out.astype(jnp.bfloat16)


def _pack_w2(w2: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, 64, 64] → [768, 128] packed conv1b weights.

    Row blocks of 128, ordered (chunk1 dy=0, chunk2 dy=0, chunk1 dy=1,
    …): chunk1 rows carry the in-place pixel pair (2q, 2q+1), chunk2
    the neighbour pair (2q−1, 2q+2).  Columns as in ``_pack_w1``.
    """
    w = w2.astype(jnp.float32)  # [dy, dx, cin, cout]
    z = jnp.zeros((C, C), jnp.float32)
    blocks = []
    for dy in range(3):
        blocks.append(jnp.block([[w[dy, 1], w[dy, 0]],     # pixel 2q
                                 [w[dy, 2], w[dy, 1]]]))   # pixel 2q+1
        blocks.append(jnp.block([[w[dy, 0], z],            # pixel 2q−1
                                 [z, w[dy, 2]]]))          # pixel 2q+2
    return jnp.concatenate(blocks, axis=0).astype(jnp.bfloat16)


def _stem_kernel(x_hbm, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                 out_ref, xv, sem, *, w_half, w_pad, h_img, pool):
    b = pl.program_id(0)
    t = pl.program_id(1)
    r0 = t * T  # first output row of this tile

    copy = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(pl.multiple_of(r0, 8), XROWS), :], xv, sem
    )
    copy.start()
    copy.wait()
    # xv [2, XROWS, w_pad] fp32: plane 0 = even cols, 1 = odd; row i ↔
    # image row r0−2+i; plane col q ↔ image col 2q / 2q+1, zeros ≥ w_half

    xe, xo = xv[0], xv[1]
    # the q−1 / q+1 lane rolls wrap through the zero padding beyond
    # w_half (w_pad ≥ w_half+1), so border taps read true zeros
    xom = pltpu.roll(xo, 1, axis=1)           # odd[q−1]  = pixel 2q−1
    xep = pltpu.roll(xe, w_pad - 1, axis=1)   # even[q+1] = pixel 2q+2

    # ---- conv1a: one 12-tap (pad 16) matmul, packed output ----------
    # out1 row i ↔ image row r0−1+i → window rows xv[i+dy]
    taps = []
    for dy in range(3):
        for p in (xom, xe, xo, xep):
            taps.append(p[dy : dy + T + 2][:, None, :].astype(jnp.bfloat16))
    xt = jnp.concatenate(
        taps + [jnp.zeros((T + 2, 4, w_pad), jnp.bfloat16)], axis=1
    )  # [T+2, 16, w_pad]

    o1 = jax.lax.dot_general(
        xt, w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T+2, w_pad, 128]
    o1 = jnp.maximum(o1 * s1_ref[0][None, None, :] + b1_ref[0][None, None, :], 0.0)

    # mask rows outside the image (conv1b must read zeros there), then
    # drop the lane padding; columns ≥ w_half never reach conv1b
    row = jax.lax.broadcasted_iota(jnp.int32, (T + 2, 1, 1), 0) + (r0 - 1)
    o2 = jnp.where((row >= 0) & (row < h_img), o1[:, :w_half, :], 0.0)

    # ---- neighbour chunk: pixels (2q−1, 2q+2) -----------------------
    # r swaps the pixel halves; sublane rolls then land 2q−1 in lanes
    # 0:64 and 2q+2 in 64:128.  Rolls wrap across q=0 / q=w_half−1 with
    # real data, so those borders are re-masked to the zero pad conv1b
    # expects ('SAME').
    r = pltpu.roll(o2, C, axis=2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, w_half, LANE), 2)
    q = jax.lax.broadcasted_iota(jnp.int32, (1, w_half, LANE), 1)
    c2 = jnp.where(
        lane < C,
        jnp.where(q > 0, pltpu.roll(r, 1, axis=1), 0.0),
        jnp.where(q < w_half - 1, pltpu.roll(r, w_half - 1, axis=1), 0.0),
    )

    # ---- conv1b: one K=768 dot at N=128 -----------------------------
    # output row j ↔ o2 row j+dy
    chunks = []
    for dy in range(3):
        chunks.append(o2[dy : dy + T].astype(jnp.bfloat16))
        chunks.append(c2[dy : dy + T].astype(jnp.bfloat16))
    a2 = jnp.concatenate(chunks, axis=2)  # [T, w_half, 768]

    acc = jax.lax.dot_general(
        a2, w2_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, w_half, 128]
    y = jnp.maximum(acc * s2_ref[0][None, None, :] + b2_ref[0][None, None, :], 0.0)
    if pool:
        # fused 2×2 maxpool: the W-reduction is a max over the packed
        # lane halves (pixels 2q / 2q+1 share a tile), the H-reduction
        # a stride-2 sublane max.  Writing [T/2, w_half, 64] instead of
        # [T, w_half, 128] cuts the kernel's HBM write traffic 4× and
        # removes the relayout afterpass that dominated at batch 32.
        yw = jnp.maximum(y[:, :, :C], y[:, :, C:])       # [T, w_half, 64]
        # stride-2 row max via a leading-dim reshape (free — lanes and
        # sublanes untouched); yw[0::2] would lower to a 3D gather,
        # which Mosaic rejects
        yr = yw.reshape(T // 2, 2, w_half, C)
        yp = jnp.maximum(yr[:, 0], yr[:, 1])             # [T/2, w_half, 64]
        out_ref[:] = yp.astype(jnp.bfloat16)
    else:
        out_ref[:] = y.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("pool", "interpret"))
def stem_pallas_packed(
    x: jnp.ndarray,
    w1: jnp.ndarray, scale1: jnp.ndarray, bias1: jnp.ndarray,
    w2: jnp.ndarray, scale2: jnp.ndarray, bias2: jnp.ndarray,
    pool: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """x [B, H, W, 1] → fused stem output.

    ``pool=False``: x-pair packed ``[B, H, W/2, 128]`` bf16
    (``jnp.reshape(·, (B, H, W, 64))`` unpacks).  ``pool=True``: the
    stem's following 2×2 maxpool is fused into the kernel and the
    output is unpacked pooled ``[B, H/2, W/2, 64]`` bf16 — the layout
    the rest of the SuperPoint trunk consumes (4× less HBM write).

    w1 [3, 3, 1, 64], w2 [3, 3, 64, 64]; scale/bias are folded
    inference BN affines (``stem_pallas.fold_bn``).  Requires
    H % 16 == 0 and W % 16 == 0.
    """
    B, H, W, _ = x.shape
    assert H % T == 0 and W % 16 == 0, (H, W)
    w_half = W // 2
    w_pad = ((w_half + 1 + LANE - 1) // LANE) * LANE  # ≥ w_half+1: roll pad

    # even/odd column planes, halo'd rows (+2 content offset, DMA slack)
    xq = x[..., 0].astype(jnp.bfloat16).astype(jnp.float32)
    planes = jnp.stack([xq[:, :, 0::2], xq[:, :, 1::2]], axis=1)  # [B,2,H,Wh]
    xp = jnp.zeros((B, 2, H + XROWS, w_pad), jnp.float32)
    xp = jax.lax.dynamic_update_slice(xp, planes, (0, 0, 2, 0))

    s1t = jnp.tile(scale1.astype(jnp.float32), 2).reshape(1, LANE)
    b1t = jnp.tile(bias1.astype(jnp.float32), 2).reshape(1, LANE)
    s2t = jnp.tile(scale2.astype(jnp.float32), 2).reshape(1, LANE)
    b2t = jnp.tile(bias2.astype(jnp.float32), 2).reshape(1, LANE)

    kernel = functools.partial(
        _stem_kernel, w_half=w_half, w_pad=w_pad, h_img=H, pool=pool
    )
    if pool:
        out_spec = pl.BlockSpec(
            (None, T // 2, w_half, C), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((B, H // 2, w_half, C), jnp.bfloat16)
    else:
        out_spec = pl.BlockSpec(
            (None, T, w_half, LANE), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((B, H, w_half, LANE), jnp.bfloat16)
    vspec = lambda shape: pl.BlockSpec(
        shape, lambda b, t: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(B, H // T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # planes stay in HBM
            vspec((16, LANE)),
            vspec((1, LANE)),
            vspec((1, LANE)),
            vspec((768, LANE)),
            vspec((1, LANE)),
            vspec((1, LANE)),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, XROWS, w_pad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, _pack_w1(w1), s1t, b1t, _pack_w2(w2), s2t, b2t)
