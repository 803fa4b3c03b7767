"""Folded-BN fast inference forward for ``SuperPointGauss2``.

Deployment path for the trained flax model (reference inference entry
points: ``/root/reference/export.py:192-352`` forward loop,
``models/model_wrap.py:64-112`` ``run``): consumes the flax
``{"params", "batch_stats"}`` variables, folds every inference
BatchNorm into a per-channel (scale, bias) epilogue, and runs

  * the **stem** (``inc``: conv1a 1→64, conv1b 64→64 at full
    resolution — 44% of forward FLOPs) through the x-pair-packed
    Pallas kernel (``ssp/kernels/stem_pallas_v2.py``), measured 1.5×
    XLA's fused DoubleConv on v5e (PERF.md "stem v2");
  * the first 2×2 maxpool **directly on the packed layout** — the two
    64-channel halves of a 128-lane tile are horizontally adjacent
    pixels, so the W-pool is one ``maximum`` over lane halves and the
    unpack reshape (a 19 MB relayout at 480×640×16) never happens;
  * the remaining trunk + heads as folded conv+scale/bias XLA ops
    (bf16 on the MXU, fp32 epilogues — numerically the flax
    ``train=False`` path with BN pre-multiplied).

Outputs match ``model.apply(variables, x, train=False)`` to bf16
rounding (parity-tested in ``tests/test_fast_infer.py``).  Training
always uses the flax module — this path exists because inference
(HA export's 100-warp forwards, the SLAM front-end loop) dominates
the deployed FLOP budget.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ssp.kernels.stem_pallas import fold_bn
from ssp.kernels.stem_pallas_v2 import stem_pallas_packed


def _fold_cbr(params: Dict[str, Any], stats: Dict[str, Any]):
    """One ``ConvBNRelu`` scope → (kernel, scale, bias) with the conv
    bias and BN affine folded into the epilogue."""
    conv, bn = params["Conv_0"], params["BatchNorm_0"]
    s, b = fold_bn(bn["scale"], bn["bias"],
                   stats["BatchNorm_0"]["mean"], stats["BatchNorm_0"]["var"])
    b = b + conv["bias"] * s
    return conv["kernel"].astype(jnp.bfloat16), s.astype(jnp.float32), b.astype(jnp.float32)


def fold_variables(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Flax variables → flat dict of folded inference weights.

    Keys: ``inc0/inc1`` (stem), ``d{1,2,3}a/b`` (trunk),
    ``pa/pb/da/db`` (heads), optional ``ds/sout`` (semantic head).
    Each value is ``(kernel bf16, scale f32, bias f32)`` except
    ``sout`` = ``(kernel bf16, bias f32)`` (plain conv, no BN).
    """
    p, s = variables["params"], variables["batch_stats"]

    def dc(name):
        return (_fold_cbr(p[name]["ConvBNRelu_0"], s[name]["ConvBNRelu_0"]),
                _fold_cbr(p[name]["ConvBNRelu_1"], s[name]["ConvBNRelu_1"]))

    folded: Dict[str, Any] = {}
    folded["inc0"], folded["inc1"] = dc("inc")
    folded["d1a"], folded["d1b"] = dc("down1")
    folded["d2a"], folded["d2b"] = dc("down2")
    folded["d3a"], folded["d3b"] = dc("down3")
    for key, scope in (("pa", "convPa"), ("pb", "convPb"),
                       ("da", "convDa"), ("db", "convDb")):
        folded[key] = _fold_cbr(p[scope], s[scope])
    if "convDS" in p:
        folded["ds"] = _fold_cbr(p["convDS"], s["convDS"])
        folded["sout"] = (p["convSout"]["kernel"].astype(jnp.bfloat16),
                          p["convSout"]["bias"].astype(jnp.float32))
    return folded


def _conv(x: jnp.ndarray, wsb, relu: bool = True) -> jnp.ndarray:
    """Folded conv+BN(+ReLU): bf16 MXU matmul, fp32 epilogue."""
    w, s, b = wsb
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y * s + b
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(jnp.bfloat16)


def _pool(x: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return jnp.maximum(jnp.maximum(x[:, :, 0, :, 0], x[:, :, 0, :, 1]),
                       jnp.maximum(x[:, :, 1, :, 0], x[:, :, 1, :, 1]))


def _stem_xla(x: jnp.ndarray, folded) -> jnp.ndarray:
    """XLA fallback stem + pool for shapes the Pallas kernel rejects."""
    return _pool(_conv(_conv(x, folded["inc0"]), folded["inc1"]))


def _stem_packed(x: jnp.ndarray, folded, interpret: bool) -> jnp.ndarray:
    """Pallas packed stem with the 2×2 maxpool fused into the kernel:
    output is already the pooled ``[B, H/2, W/2, 64]`` trunk input.
    (Writing packed full-res and pooling in XLA costs a 1.3 GB
    relayout at 480×640×32 — measured slower than the XLA stem.)
    """
    (w1, s1, b1), (w2, s2, b2) = folded["inc0"], folded["inc1"]
    return stem_pallas_packed(
        x, w1, s1, b1, w2, s2, b2, pool=True, interpret=interpret
    )


# NB: a "W-pair" variant (two batch-halves side by side along W with a
# zero guard, to double lane fill at narrow shapes) was prototyped and
# removed: the guard columns are nonzero AFTER conv1a (folded bias/BN
# shift + edge taps), so conv1b's border reads are contaminated and
# 'SAME' padding cannot be reproduced through two conv layers without
# in-kernel guard masking.  If narrow-shape lane fill matters, the
# masking must live inside stem_pallas_packed itself.


def _forward(x: jnp.ndarray, folded, use_packed,
             interpret: bool) -> Dict[str, jnp.ndarray]:
    """Folded-BN forward body shared by both entry points.

    ``use_packed``: False → XLA stem, True → direct packed Pallas stem.
    """
    if use_packed:
        t = _stem_packed(x, folded, interpret)
    else:
        t = _stem_xla(x.astype(jnp.bfloat16), folded)
    if (use_packed and t.shape[0] <= 4
            and t.shape[1] % 16 == 0 and t.shape[2] % 2 == 0):
        # x-pair packed down1 (the next 22% of forward FLOPs — same
        # half-lane problem the packed stem solved; the stem's pooled
        # output reshapes into the packed layout for free).  Batch-
        # gated: measured in-context marginals (scripts/bench_down1_ab
        # .py, v5e) — B=4: pallas 1.16 vs XLA 2.70 ms (KITTI shape),
        # 0.74 vs 1.41 (480×640); B=8: tie; B=16/32: pallas loses ~15%
        # (XLA's large-batch convs reach the MXU efficiency the packed
        # layout buys at small batch, and the kernel's HBM pad-copy +
        # halo recompute then dominate).  Small batch is the SLAM/
        # sequence-export regime; big batch (HA chunks, bench) keeps
        # the XLA convs.
        from ssp.kernels.down1_pallas import down1_pallas_packed

        (wa, sa, ba), (wb, sb, bb) = folded["d1a"], folded["d1b"]
        t = down1_pallas_packed(t, wa, sa, ba, wb, sb, bb,
                                pool=True, interpret=interpret)
    else:
        t = _pool(_conv(_conv(t, folded["d1a"]), folded["d1b"]))
    t = _pool(_conv(_conv(t, folded["d2a"]), folded["d2b"]))
    feat = _conv(_conv(t, folded["d3a"]), folded["d3b"])

    semi = _conv(_conv(feat, folded["pa"]), folded["pb"], relu=False)
    desc = _conv(_conv(feat, folded["da"]), folded["db"], relu=False)
    desc32 = desc.astype(jnp.float32)
    desc32 = desc32 / (jnp.linalg.norm(desc32, axis=-1, keepdims=True) + 1e-12)
    out = {"semi": semi.astype(jnp.float32), "desc": desc32}

    if "sout" in folded:
        cS = _conv(feat, folded["ds"])
        wS, bS = folded["sout"]
        sem = jax.lax.conv_general_dilated(
            cS, wS, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + bS
        B, Hc, Wc, nc = sem.shape
        out["sem"] = jax.image.resize(
            sem, (B, Hc * 8, Wc * 8, nc), method="linear"
        )
    return out


def packed_stem_profitable(input_hw: Tuple[int, int]) -> bool:
    """True when the x-pair-packed Pallas stem should win at this shape.

    The packed layout puts ``W/2`` positions on the 128-wide lane axis,
    so the kernel pads ``W/2`` up to a multiple of 128 and burns that
    fraction of MXU work.  Measured HA-kernel A/B on v5e
    (``scripts/bench_fwd_ab_240.py`` / ``_kitti.py``):

      480×640  (w_half 320 → 17% pad): packed 1215 vs flax 938 img/s
      384×1248 (w_half 624 →  2% pad): packed 18.1 vs flax 14.6 img/s
      240×320  (w_half 160 → 38% pad): packed 28.1 vs flax 29.6 img/s

    so the gate is the measured knee: pad waste ≤ 25% (plus the
    kernel's H/W % 16 alignment requirement).  Below it the plain flax
    ``model.apply`` is the fastest forward (the folded-BN XLA-stem
    variant measured *slower* than flax there — 26.5 img/s — so
    ``best_apply_fn`` falls back to flax, not to the folded path).
    """
    H, W = input_hw
    if H % 16 or W % 16:
        return False
    w_half = W // 2
    pad = (-w_half) % 128
    return pad / (w_half + pad) <= 0.25


def make_fast_apply(
    variables: Dict[str, Any],
    *,
    input_hw: Tuple[int, int],
    interpret: bool = False,
    use_packed: Optional[bool] = None,
) -> Callable[[jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Build ``fn(images [B, H, W, 1]) → {"semi", "desc"[, "sem"]}``
    matching ``SuperPointGauss2.apply(variables, x, train=False)``.

    Weights are folded once at build time and closed over (jittable;
    callers jit the composite pipeline).  ``use_packed=None`` applies
    the measured profitability gate (``packed_stem_profitable``) *and*
    requires a TPU backend (the Mosaic kernel does not lower on CPU —
    same gate as ``fast_apply_fn``); pass an explicit bool to force a
    stem (the kernel itself only needs H % 16 == 0 and W % 16 == 0 —
    parity tests force it at tiny shapes the gate would reject).
    """
    folded = fold_variables(variables)
    if use_packed is None:
        on_tpu = jax.devices()[0].platform == "tpu"
        use_packed = (on_tpu or interpret) and packed_stem_profitable(input_hw)

    def fast_apply(x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return _forward(x, folded, use_packed, interpret)

    return fast_apply


def supports_fast(variables: Dict[str, Any]) -> bool:
    """True when ``variables`` has the SuperPointGauss2 param layout
    (the layouts ``fold_variables`` understands).  MagicLeap-style
    trees keep the flax ``model.apply`` path."""
    p = variables.get("params", {})
    return "inc" in p and bool(variables.get("batch_stats"))


def best_apply_fn(model, variables: Dict[str, Any],
                  input_hw: Optional[Tuple[int, int]] = None,
                  enable: bool = True) -> Callable:
    """``fast_apply_fn`` when the variables support BN folding *and*
    the packed stem wins at ``input_hw``, else the flax ``model.apply``
    — the one-line switch the export/val CLIs use so every inference
    path gets the fastest measured forward for its shape.

    Pass ``input_hw`` whenever the caller knows the image shape: at
    shapes where the packed stem loses to lane padding (240×320), the
    flax path is the fastest forward outright (see
    ``packed_stem_profitable``).  With ``input_hw=None`` the choice is
    deferred to ``fast_apply_fn``'s per-trace shape gate, which falls
    back only as far as the folded XLA stem.

    ``enable=False`` (the ``model.fast_inference: false`` YAML flag)
    always returns the fp32 flax ``model.apply`` — the reproducibility
    opt-out for exports/evals that must not shift with the bf16 folded
    path (keypoint-set agreement between the two is ~90%, not exact).
    """
    if not enable or not supports_fast(variables):
        return model.apply
    if input_hw is not None and not packed_stem_profitable(input_hw):
        return model.apply
    return fast_apply_fn


def fast_apply_fn(variables: Dict[str, Any], x: jnp.ndarray,
                  train: bool = False) -> Dict[str, jnp.ndarray]:
    """Drop-in replacement for ``model.apply`` on gauss2-layout
    variables (same ``(variables, x, train=False)`` signature, so the
    export/val pipelines — reference `export.py:192-352` forward loop —
    can swap it in without replumbing).

    Folds BN *inside the trace* (a few thousand scalar ops — noise next
    to the convs) so ``variables`` may be a traced jit argument.  Uses
    the packed Pallas stem only on TPU backends with 16-aligned shapes;
    elsewhere (CPU test meshes, odd shapes) the folded XLA stem keeps
    identical numerics.
    """
    if train:
        raise ValueError("fast_apply_fn is inference-only (train=False)")
    folded = fold_variables(variables)
    _, H, W, _ = x.shape
    on_tpu = jax.devices()[0].platform == "tpu"
    use_packed = on_tpu and packed_stem_profitable((H, W))
    return _forward(x, folded, use_packed, interpret=False)
