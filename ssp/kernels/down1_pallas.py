"""Fused SuperPoint down1, x-pair packed: the next 22% of forward FLOPs.

Reference ``models/SuperPointNet_gauss2.py:19-22`` / ``unet_parts.py:38-48``
(down1 = maxpool → two 64→64 3×3 convs) runs at H/2×W/2 with C=64 — the
same half-lane MXU problem the packed stem (``stem_pallas_v2.py``)
solved for conv1a/b.  Both down1 convs are 64→64, i.e. exactly the
stem's conv1b shape, so the whole v2 design transfers:

- the stem's pooled output ``[B, H/2, W/2, 64]`` IS the packed layout
  ``[B, H/2, W/4, 128]`` under a row-major reshape (adjacent columns'
  64 channels share one 128-lane tile) — packing is free;
- each conv is ONE ``[T, W/4, 768] @ [768, 128]`` dot per row tile
  (chunk1 = in-place pixel pair, chunk2 = neighbour pair built with a
  64-lane rotate + two sublane rolls + selects), K = 768 dense,
  N = 128 fully used — ``_pack_w2`` reused verbatim;
- down1's following 2×2 maxpool fuses as in the stem: lane-half max
  (W) + stride-2 row max (H), output ``[B, H/4, W/4, 64]`` — which is
  again the packed layout for a future down2 treatment.

Requires H/2 % 16 == 0 and W % 4 == 0 (the shapes the packed stem's
profitability gate admits: 480×640, 384×1248).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssp.kernels.stem_pallas_v2 import _pack_w2

C = 64
LANE = 128
T = 16      # output rows per program
XROWS = 24  # input rows DMA'd per program (covers T+4, 8-aligned)
QPAD = 8    # zero columns appended to the packed-q dim (roll slack)


def _down1_kernel(x_hbm, wa_ref, sa_ref, ba_ref, wb_ref, sb_ref, bb_ref,
                  out_ref, xv, sem, *, w4, h_img, pool):
    b = pl.program_id(0)
    t = pl.program_id(1)
    r0 = t * T

    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(pl.multiple_of(r0, 8), XROWS), :, :], xv, sem
    )
    copy.start()
    copy.wait()
    # xv [XROWS, w4+QPAD, 128] bf16: row i ↔ image row r0−2+i; packed
    # col q ↔ pixel pair (2q, 2q+1); cols ≥ w4 are zeros

    w4p = w4 + QPAD
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, w4p, LANE), 2)
    q = jax.lax.broadcasted_iota(jnp.int32, (1, w4p, LANE), 1)

    def neighbour(o):
        """Packed activation [R, w4p, 128] → neighbour chunk: pixel
        2q−1 in lanes 0:64, 2q+2 in 64:128 (stem v2's c2 trick; the
        rolls wrap through the zero pad, so borders read true zeros —
        o must be zero at q ≥ w4)."""
        r = pltpu.roll(o, C, axis=2)
        return jnp.where(
            lane < C,
            jnp.where(q > 0, pltpu.roll(r, 1, axis=1), 0.0),
            pltpu.roll(r, w4p - 1, axis=1),
        )

    def conv(act, w_ref, s_ref, b_ref, rows_out):
        """One packed 64→64 3×3 conv: act [rows_out+2, w4p, 128]
        (already zero outside the image) → [rows_out, w4p, 128] fp32."""
        nb = neighbour(act)
        chunks = []
        for dy in range(3):
            chunks.append(act[dy : dy + rows_out].astype(jnp.bfloat16))
            chunks.append(nb[dy : dy + rows_out].astype(jnp.bfloat16))
        a = jnp.concatenate(chunks, axis=2)  # [rows_out, w4p, 768]
        o = jax.lax.dot_general(
            a, w_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.maximum(o * s_ref[0][None, None, :] + b_ref[0][None, None, :], 0.0)

    # conv2a over rows r0−1 … r0+T (output rows of conv2a needed by
    # conv2b's dy window); input rows r0−2 … r0+T+1 = xv[0 : T+4]
    xin = jnp.where(q < w4, xv[: T + 4].astype(jnp.float32), 0.0)
    o1 = conv(xin, wa_ref, sa_ref, ba_ref, T + 2)  # rows ↔ r0−1+i
    # zero outside the image: rows beyond [0, h_img) and the q pad
    # (ReLU(bias) there would contaminate conv2b's border taps)
    row = jax.lax.broadcasted_iota(jnp.int32, (T + 2, 1, 1), 0) + (r0 - 1)
    o1 = jnp.where((row >= 0) & (row < h_img) & (q < w4), o1, 0.0)

    y = conv(o1, wb_ref, sb_ref, bb_ref, T)  # [T, w4p, 128]
    if pool:
        yw = jnp.maximum(y[:, :w4, :C], y[:, :w4, C:])  # [T, w4, 64]
        yr = yw.reshape(T // 2, 2, w4, C)
        out_ref[:] = jnp.maximum(yr[:, 0], yr[:, 1]).astype(jnp.bfloat16)
    else:
        out_ref[:] = y[:, :w4, :].astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("pool", "interpret"))
def down1_pallas_packed(
    x: jnp.ndarray,
    wa: jnp.ndarray, scale_a: jnp.ndarray, bias_a: jnp.ndarray,
    wb: jnp.ndarray, scale_b: jnp.ndarray, bias_b: jnp.ndarray,
    pool: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """x [B, H2, W2, 64] (the pooled stem output) → down1 output.

    ``pool=True``: fused trailing 2×2 maxpool, ``[B, H2/2, W2/2, 64]``
    bf16 (the trunk layout down2 consumes).  ``pool=False``: unpooled
    ``[B, H2, W2, 64]``.  wa/wb ``[3, 3, 64, 64]``; scale/bias folded
    inference BN affines.  Requires H2 % 16 == 0, W2 % 2 == 0.
    """
    B, H2, W2, c = x.shape
    assert c == C and H2 % T == 0 and W2 % 2 == 0, (x.shape,)
    w4 = W2 // 2

    # free pack: adjacent columns' channels share a 128-lane tile
    xpk = x.astype(jnp.bfloat16).reshape(B, H2, w4, LANE)
    xp = jnp.zeros((B, H2 + XROWS, w4 + QPAD, LANE), jnp.bfloat16)
    xp = jax.lax.dynamic_update_slice(xp, xpk, (0, 2, 0, 0))

    def aff(v):
        return jnp.tile(v.astype(jnp.float32), 2).reshape(1, LANE)

    if pool:
        out_spec = pl.BlockSpec(
            (None, T // 2, w4, C), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((B, H2 // 2, w4, C), jnp.bfloat16)
    else:
        out_spec = pl.BlockSpec(
            (None, T, w4, LANE), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((B, H2, w4, LANE), jnp.bfloat16)
    vspec = lambda shape: pl.BlockSpec(
        shape, lambda b, t: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_down1_kernel, w4=w4, h_img=H2, pool=pool)
    return pl.pallas_call(
        kernel,
        grid=(B, H2 // T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # packed input stays in HBM
            vspec((768, LANE)), vspec((1, LANE)), vspec((1, LANE)),
            vspec((768, LANE)), vspec((1, LANE)), vspec((1, LANE)),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((XROWS, w4 + QPAD, LANE), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, _pack_w2(wa), aff(scale_a), aff(bias_a),
      _pack_w2(wb), aff(scale_b), aff(bias_b))
