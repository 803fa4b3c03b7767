"""Fused SuperPoint stem (conv1a → BN → relu → conv1b → BN → relu) as a
single Pallas kernel — an **experiment on the inference hot spot, not
wired into the model**: measured 11.5 ms vs XLA's 7.2 ms at 480×640×16
on v5e (the layout shuffles outweigh the saved HBM round-trips —
analysis in PERF.md).  Kept parity-tested as the starting point for a
future channel-pair-packed layout.

Why: the first DoubleConv runs at 480×640×64 where XLA's conv achieves
~37 TF/s on v5e — each layer round-trips a 630 MB (batch 16, bf16)
activation through HBM.  This kernel keeps the whole block in VMEM per
row tile and reformulates both convs as MXU matmuls.

Key trick: conv1b's im2col needs out1 shifted by dx₂ ∈ {0, 1, 2}
columns, but lane-shifting the [rows, 768, 64] out1 is expensive VPU
shuffling.  Convolution is shift-equivariant, so a column-shifted out1
is conv1a of the column-shifted *input* — and the input is a tiny
single-channel 2-D tile whose lane rolls are nearly free.  The kernel
therefore builds one 15-tap stack (3 dy × 5 combined-dx) of the input
and produces each shifted out1 variant directly with its own
tap-selection weight matrix; conv1b accumulates one K=128 (dy-pair) and
one K=64 dot per variant.  Inference BatchNorm folds into per-channel
scale/bias epilogues.

'SAME' zero padding is materialized in the input; each out1 variant is
re-masked to zero outside the image so conv1b reads true zeros, not
partial border sums.

Training and non-TPU paths keep the plain XLA convs
(``ssp/models/superpoint.py``); parity vs that path is covered by
``tests/test_kernels.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 64      # stem width
LANE = 128
T = 16      # output rows per program (8-aligned DMA starts)
XROWS = 24  # input rows DMA'd per program (covers T+4, 8-aligned)


def _pack_w1(w1: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, 1, 64] → [3, 16, 64]: per shift-variant dx₂, the 15-tap
    selection matrix — tap (dy, dxc) row carries w1[dy, dxc − dx₂]."""
    w = w1.reshape(3, 3, C).astype(jnp.float32)
    out = jnp.zeros((3, 16, C), jnp.float32)
    for dx2 in range(3):
        for dy in range(3):
            for dx1 in range(3):
                out = out.at[dx2, dy * 5 + dx1 + dx2].set(w[dy, dx1])
    return out.astype(jnp.bfloat16)


def _pack_w2(w2: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, 64, 64] → [576, 64] grouped by dx: per dx block (192 rows),
    a (dy=0, dy=1) 128-row pair then the dy=2 64-row single."""
    taps = w2.reshape(3, 3, C, C)  # [dy, dx, cin, cout]
    blocks = []
    for dx in range(3):
        blocks += [taps[0, dx], taps[1, dx], taps[2, dx]]
    return jnp.concatenate(blocks, axis=0)  # [576, 64]


def _stem_kernel(x_hbm, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                 out_ref, xv, sem, *, w_img, w_pad, h_img):
    b = pl.program_id(0)
    t = pl.program_id(1)
    r0 = t * T  # first output row of this tile

    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(pl.multiple_of(r0, 8), XROWS), :], xv, sem
    )
    copy.start()
    copy.wait()
    x = xv[:]  # [XROWS, w_pad] fp32; row i ↔ image row r0-2+i, lane L ↔ col L-2

    # ---- 15-tap input stack: all (dy, dx₁+dx₂) shifts ------------------
    # tap (dy, dxc) lane j ↔ x col j-2+dxc; rows sliced per dy
    taps1 = []
    for dy in range(3):
        for dxc in range(5):
            rolled = pltpu.roll(x, (w_pad - dxc) % w_pad, axis=1)
            taps1.append(rolled[dy : dy + T + 2][:, None, :].astype(jnp.bfloat16))
    xt = jnp.concatenate(
        taps1 + [jnp.zeros((T + 2, 1, w_pad), jnp.bfloat16)], axis=1
    )  # [T+2, 16, w_pad]

    lane = jax.lax.broadcasted_iota(jnp.int32, (T + 2, w_pad, 1), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (T + 2, w_pad, 1), 0) + (r0 - 1)
    row_ok = (row >= 0) & (row < h_img)

    acc2 = jnp.zeros((T, w_img, C), jnp.float32)
    for dx2 in range(3):
        # out1 shifted by dx₂: conv1a with the dx₂-selected taps
        acc1 = jax.lax.dot_general(
            xt, w1_ref[dx2],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T+2, w_pad, 64]; lane j ↔ out1 col j-1+dx₂
        o = jnp.maximum(acc1 * s1_ref[0][None, None, :] + b1_ref[0][None, None, :], 0.0)
        col = lane - 1 + dx2  # underlying out1 column
        ok = (col >= 0) & (col < w_img) & row_ok
        o = jnp.where(ok, o, 0.0).astype(jnp.bfloat16)

        pair = jnp.concatenate([o[0:T, :w_img, :], o[1 : T + 1, :w_img, :]], axis=-1)
        acc2 = acc2 + jax.lax.dot_general(
            pair, w2_ref[dx2 * 192 : dx2 * 192 + 128, :],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc2 = acc2 + jax.lax.dot_general(
            o[2 : T + 2, :w_img, :], w2_ref[dx2 * 192 + 128 : dx2 * 192 + 192, :],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    y = jnp.maximum(acc2 * s2_ref[0][None, None, :] + b2_ref[0][None, None, :], 0.0)
    out_ref[:] = y.astype(jnp.bfloat16)


def fold_bn(gamma, beta, mean, var, eps=1e-5):
    """Inference BatchNorm → per-channel (scale, bias)."""
    scale = gamma / jnp.sqrt(var + eps)
    return scale, beta - mean * scale


@functools.partial(jax.jit, static_argnames=("interpret",))
def stem_pallas(
    x: jnp.ndarray,
    w1: jnp.ndarray, scale1: jnp.ndarray, bias1: jnp.ndarray,
    w2: jnp.ndarray, scale2: jnp.ndarray, bias2: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """x [B, H, W, 1] → fused stem output [B, H, W, 64] bf16.

    w1 [3, 3, 1, 64], w2 [3, 3, 64, 64]; scale/bias are folded inference
    BN affines (``fold_bn``).  Requires H % 16 == 0 and W % 128 == 0
    (SuperPoint resolutions are 8-multiples; pad if needed).
    """
    B, H, W, _ = x.shape
    assert H % T == 0 and W % LANE == 0, (H, W)
    w_pad = ((W + 4 + LANE - 1) // LANE) * LANE

    # halo'd single-channel input: rows +2 (plus DMA slack), cols +2
    xp = jnp.zeros((B, H + XROWS, w_pad), jnp.float32)
    xp = jax.lax.dynamic_update_slice(
        xp, x[..., 0].astype(jnp.bfloat16).astype(jnp.float32), (0, 2, 2)
    )

    w1p = _pack_w1(w1)
    w2p = _pack_w2(w2).astype(jnp.bfloat16)
    row = lambda v: v.reshape(1, C).astype(jnp.float32)

    kernel = functools.partial(_stem_kernel, w_img=W, w_pad=w_pad, h_img=H)
    vspec = lambda shape: pl.BlockSpec(
        shape, lambda b, t: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(B, H // T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xp stays in HBM
            vspec((3, 16, C)),
            vspec((1, C)),
            vspec((1, C)),
            vspec((576, C)),
            vspec((1, C)),
            vspec((1, C)),
        ],
        out_specs=pl.BlockSpec(
            (None, T, W, C), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((XROWS, w_pad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        # the unrolled 3-variant loop keeps several [T+2, 768, 64] fp32
        # accumulators live — past the default 16 MB scoped limit, well
        # inside v5e's physical VMEM
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, w1p, row(scale1), row(bias1), w2p, row(scale2), row(bias2))
