"""Semantic segmentation loss: cross-entropy with an ignore class.

Spec: reference ``Train_model_heatmap_all.sem_loss``
(``Train_model_heatmap_all.py:181-193``) — ``nn.CrossEntropyLoss``
with ``ignore_index=133``, i.e. mean NLL over non-ignored pixels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _picked(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """``logits[..., labels]`` as a one-hot reduction over the class dim.

    A ``take_along_axis`` here lowers to a TPU gather (~1e8 elem/s —
    tens of ms at [16, 240, 320]); the iota-compare multiply-reduce
    fuses into the same vector loop as the adjacent logsumexp instead.
    """
    C = logits.shape[-1]
    onehot = labels[..., None] == jnp.arange(C, dtype=labels.dtype)
    return jnp.sum(jnp.where(onehot, logits, 0.0), axis=-1)


def semantic_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_class: int = 133
) -> jnp.ndarray:
    """logits: [B, H, W, C]; labels: int [B, H, W] in [0, C] (C = ignore)."""
    valid = (labels != ignore_class).astype(jnp.float32)
    safe = jnp.where(labels == ignore_class, 0, labels)
    nll = jax.nn.logsumexp(logits, axis=-1) - _picked(logits, safe)
    return jnp.sum(nll * valid) / (jnp.sum(valid) + 1e-9)


def _phase_tables(scale: int):
    """Bilinear ↑scale phase weights (half-pixel centers, edge clamp —
    the ``jax.image.resize(method='linear')`` convention).

    Full-res pixel ``p = scale*i + d`` samples coarse coordinate
    ``i + (2d + 1 - scale) / (2*scale)``; for each phase ``d`` that is
    a fixed offset ``lo(d) ∈ {-1, 0}`` and weight pair ``(w0, w1)``
    over coarse cells ``i+lo`` and ``i+lo+1``.
    """
    import numpy as np

    d = np.arange(scale)
    f = (2.0 * d + 1.0 - scale) / (2.0 * scale)
    lo = np.where(f < 0, -1, 0)
    t = f - lo  # ∈ [0, 1): weight of the i+lo+1 tap
    return lo.astype(np.int32), (1.0 - t).astype(np.float32), t.astype(np.float32)


def _phase_tap_matrix(scale: int):
    """[scale², 9] phase weights over the 3×3 coarse-tap neighborhood.

    Phase p = dh·scale + dw combines taps (lo(dh)+{0,1}) × (lo(dw)+{0,1})
    of the coarse grid (offsets −1..+1 → flattened 3×3 index) with
    separable bilinear weights.
    """
    import numpy as np

    lo, w0, w1 = _phase_tables(scale)
    P = np.zeros((scale * scale, 9), np.float32)
    for dh in range(scale):
        for dw in range(scale):
            p = dh * scale + dw
            for r, wr in ((lo[dh] + 1, w0[dh]), (lo[dh] + 2, w1[dh])):
                for c, wc in ((lo[dw] + 1, w0[dw]), (lo[dw] + 2, w1[dw])):
                    P[p, r * 3 + c] += wr * wc
    return P


def semantic_loss_coarse(
    coarse: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_class: int = 133,
    scale: int = 8,
) -> jnp.ndarray:
    """``semantic_loss(resize(coarse, scale), labels)`` without the
    full-resolution materialize → multi-pass log-softmax chain.

    The reference upsamples 1/8-res logits to H×W before the CE
    (``models/SuperPointNet_gauss2_ssmall.py:86-91`` →
    ``Train_model_heatmap_all.py:181-193``); at [16, 240, 320, 133]
    fp32 that chain costs several HBM round-trips of a 650 MB tensor
    (resize H-pass, W-pass, log-softmax max/sum/sub, gather) — with the
    133-channel minor dim padded to 2 TPU lanes of 128 for each pass.
    But bilinear ↑scale logits are, per output-pixel *phase*
    (p = (y mod scale, x mod scale)), a fixed 2×2-tap combination of
    the coarse map, so the CE reads only the [B, Hc, Wc, 9·C] tap
    neighborhood (≈90 MB): ``logits[..., p, c] = Σ_k P[p, k]·V[..., k, c]``
    feeds logsumexp / one-hot-pick reductions over c that XLA fuses
    with the tiny-k contraction — the [B, Hc, Wc, scale², C] tensor is
    consumed as it is produced.  Exactly equal (value and gradient) to
    the resize-then-CE formulation: same half-pixel-center, edge-clamp
    convention (``jax.image.resize(method='linear')``).

    ``labels``: int [B, Hc*scale, Wc*scale].
    """
    B, Hc, Wc, C = coarse.shape
    P = jnp.asarray(_phase_tap_matrix(scale))  # [s², 9]

    # 3×3 tap neighborhood via edge-clamp pad + 9 shifted views
    cpad = jnp.pad(coarse, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    V = jnp.stack(
        [cpad[:, r:r + Hc, c:c + Wc, :] for r in range(3) for c in range(3)],
        axis=3,
    )  # [B, Hc, Wc, 9, C]

    # labels regrouped by phase: [B, Hc, Wc, s²]
    lab = labels.reshape(B, Hc, scale, Wc, scale).transpose(0, 1, 3, 2, 4)
    lab = lab.reshape(B, Hc, Wc, scale * scale)
    valid = (lab != ignore_class).astype(jnp.float32)
    safe = jnp.where(lab == ignore_class, 0, lab)

    # full-res logits, consumed by the reductions as produced
    logits = jnp.einsum("bhwkc,pk->bhwpc", V, P)  # [B, Hc, Wc, s², C]
    lse = jax.nn.logsumexp(logits, axis=-1)  # [B, Hc, Wc, s²]
    nll = lse - _picked(logits, safe)
    return jnp.sum(nll * valid) / (jnp.sum(valid) + 1e-9)
