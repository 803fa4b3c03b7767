"""Random-homography sampling and point warping, pure JAX.

Behavioural spec comes from the reference's numpy sampler
(``/root/reference/utils/homographies.py:12-141``, itself a port of
rpautrat/SuperPoint): a half-size centred patch of the unit square is
perturbed by truncated-normal perspective displacements, one of several
candidate scalings, a uniform in-bounds translation, and one of several
candidate rotations; the homography is the DLT solve mapping the output
unit square onto the perturbed patch (output→input, i.e. the *inverse*
warp convention of ``tf.contrib.image.transform``).

TPU-first differences from the reference:
  * No host rejection sampling.  All scale/angle candidates are evaluated
    in one shot and a uniformly-random *valid* candidate is selected with
    a masked-argmax trick — fixed shapes, jit/vmap friendly.
  * The 8×8 DLT system is solved with ``jnp.linalg.solve`` instead of
    ``cv2.getPerspectiveTransform``.
  * Everything is keyed by JAX PRNG, so a batch of homographies is one
    ``vmap`` and runs on device inside the data-prep graph.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def adjugate3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate of [..., 3, 3] (adj(M) = det(M)·M⁻¹)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    row0 = jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], axis=-1)
    row1 = jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], axis=-1)
    row2 = jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def inv3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of [..., 3, 3].

    Replaces ``jnp.linalg.inv`` on the geometry paths: batched LU on
    tiny matrices is both slower and dramatically more expensive to
    compile on TPU than the adjugate formula.
    """
    adj = adjugate3(M)
    det = (
        M[..., 0, 0] * adj[..., 0, 0]
        + M[..., 0, 1] * adj[..., 1, 0]
        + M[..., 0, 2] * adj[..., 2, 0]
    )
    return adj / det[..., None, None]


def _quad_basis(q: jnp.ndarray) -> jnp.ndarray:
    """Projective map sending the basis frame e1,e2,e3,(1,1,1) onto the
    4 points ``q [4, 2]``: columns λᵢ·[qᵢ, 1] with [λ] = A⁻¹·[q₄, 1]."""
    ones = jnp.ones_like(q[:, :1])
    qh = jnp.concatenate([q, ones], axis=-1)  # [4, 3]
    A = qh[:3].T  # [3, 3] columns are q1..q3 homogeneous
    lam = jnp.matmul(inv3(A), qh[3], precision=jax.lax.Precision.HIGHEST)
    return A * lam[None, :]


def homography_from_corners(pts1: jnp.ndarray, pts2: jnp.ndarray) -> jnp.ndarray:
    """The 3×3 H with H @ [pts1, 1]ᵀ ∝ [pts2, 1]ᵀ (4 points, (x, y)).

    Equivalent of ``cv2.getPerspectiveTransform(pts1, pts2)``
    (reference call site ``utils/homographies.py:140``), computed by the
    classical projective-basis construction — two closed-form 3×3 maps
    instead of an 8×8 DLT solve (the batched LU was a compile-time and
    runtime sink on TPU).  Normalized so H[2,2] = 1.
    """
    M1 = _quad_basis(pts1)
    M2 = _quad_basis(pts2)
    # fp32 accumulation: these two products ARE the homography — the
    # platform's default bf16 matmul precision would smear it by ~1 px
    # at 320-px width (warp_points below is hardened the same way)
    H = jnp.matmul(M2, inv3(M1), precision=jax.lax.Precision.HIGHEST)
    return H / H[2, 2]


def warp_points(points: jnp.ndarray, H: jnp.ndarray) -> jnp.ndarray:
    """Warp ``points [..., N, 2]`` (x, y) by homography ``H [..., 3, 3]``.

    Same contract as the reference's ``warp_points``
    (``utils/utils.py:315-343``) but batched via broadcasting instead of
    a reshape dance.
    """
    pts_h = jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)
    # tiny 3×3 contraction — force fp32 accumulation (the platform default
    # matmul precision may be bf16, which is far too coarse for geometry)
    warped = jnp.einsum(
        "...ij,...nj->...ni", H, pts_h, precision=jax.lax.Precision.HIGHEST
    )
    return warped[..., :2] / (warped[..., 2:] + 1e-12)


def scale_homography(
    H: jnp.ndarray, shape: Tuple[int, int], shift: Tuple[float, float] = (-1.0, -1.0)
) -> jnp.ndarray:
    """Conjugate a normalized-coordinate H into pixel coordinates.

    ``T`` maps pixel (x, y) → normalized ([shift, shift+2]²); returns
    ``T⁻¹ H T`` (reference ``utils/homographies.py:278-282``).
    ``shape`` is (H, W).
    """
    height, width = shape
    T = jnp.array(
        [[2.0 / width, 0.0, shift[0]], [0.0, 2.0 / height, shift[1]], [0.0, 0.0, 1.0]],
        dtype=H.dtype,
    )
    mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    return mm(mm(jnp.linalg.inv(T), H), T)


def _pick_valid(key: jax.Array, valid: jnp.ndarray) -> jnp.ndarray:
    """Uniformly pick one index among ``valid`` (boolean vector).

    argmax of iid U(0,1) restricted to the valid set is uniform on it.
    Replaces the reference's data-dependent ``np.where`` + randint
    (``utils/homographies.py:95-96``) with fixed shapes.
    """
    u = jax.random.uniform(key, valid.shape)
    return jnp.argmax(jnp.where(valid, u, -1.0))


def sample_homography(
    key: jax.Array,
    *,
    shift: float = -1.0,
    perspective: bool = True,
    scaling: bool = True,
    rotation: bool = True,
    translation: bool = True,
    n_scales: int = 5,
    n_angles: int = 25,
    scaling_amplitude: float = 0.1,
    perspective_amplitude_x: float = 0.1,
    perspective_amplitude_y: float = 0.1,
    patch_ratio: float = 0.5,
    max_angle: float = math.pi / 2,
    allow_artifacts: bool = False,
    translation_overflow: float = 0.0,
) -> jnp.ndarray:
    """Sample one random homography on the unit square (+``shift``).

    Returns H mapping output coords → input coords, in the square
    ``[shift, shift+1+shift]²`` — callers use ``shift=-1`` to get a
    homography acting on ``[-1, 1]²`` normalized image coordinates (the
    reference calls it with ``shape=[2,2], shift=-1``,
    ``datasets/Coco.py:262-265``; with shape=[2,2] the final rescale is
    ×2, i.e. exactly the unit-square H conjugated onto [0,2]²+shift).
    """
    k_persp, k_scale_s, k_scale_pick, k_trans, k_rot_pick = jax.random.split(key, 5)

    # Output square corners and centred input patch, (x, y), in [0, 1]².
    pts1 = jnp.array([[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [1.0, 0.0]])
    margin = (1.0 - patch_ratio) / 2.0
    pts2 = margin + patch_ratio * pts1

    def trunc_normal(k, scale):
        # truncnorm on ±2σ, matching scipy.stats.truncnorm(-2, 2, scale=σ)
        return jax.random.truncated_normal(k, -2.0, 2.0) * scale

    if perspective:
        ax = perspective_amplitude_x if allow_artifacts else min(perspective_amplitude_x, margin)
        ay = perspective_amplitude_y if allow_artifacts else min(perspective_amplitude_y, margin)
        kp, kl, kr = jax.random.split(k_persp, 3)
        py = trunc_normal(kp, ay / 2.0)
        lx = trunc_normal(kl, ax / 2.0)
        rx = trunc_normal(kr, ax / 2.0)
        pts2 = pts2 + jnp.stack(
            [
                jnp.stack([lx, py]),
                jnp.stack([lx, -py]),
                jnp.stack([rx, py]),
                jnp.stack([rx, -py]),
            ]
        )

    if scaling:
        # n_scales truncated-normal candidates plus a guaranteed scale=1
        # fallback at index 0 (reference prepends 1, :84).
        s = jax.random.truncated_normal(k_scale_s, -2.0, 2.0, (n_scales,))
        scales = jnp.concatenate([jnp.ones((1,)), 1.0 + s * scaling_amplitude / 2.0])
        center = jnp.mean(pts2, axis=0, keepdims=True)
        cand = (pts2 - center)[None] * scales[:, None, None] + center  # [n+1, 4, 2]
        if allow_artifacts:
            # reference: uniform over the first n_scales candidates (:90)
            valid = jnp.arange(n_scales + 1) < n_scales
        else:
            valid = jnp.all((cand >= 0.0) & (cand < 1.0), axis=(1, 2))
            valid = valid.at[0].set(True)  # scale=1 always safe fallback
        pts2 = cand[_pick_valid(k_scale_pick, valid)]

    if translation:
        t_min = jnp.min(pts2, axis=0)
        t_max = jnp.min(1.0 - pts2, axis=0)
        if allow_artifacts:
            t_min = t_min + translation_overflow
            t_max = t_max + translation_overflow
        u = jax.random.uniform(k_trans, (2,))
        pts2 = pts2 + (u * (t_max + t_min) - t_min)[None, :]

    if rotation:
        angles = jnp.linspace(-max_angle, max_angle, n_angles)
        angles = jnp.concatenate([angles, jnp.zeros((1,))])  # zero fallback (:111)
        center = jnp.mean(pts2, axis=0, keepdims=True)
        cos, sin = jnp.cos(angles), jnp.sin(angles)
        rot = jnp.stack(
            [jnp.stack([cos, -sin], axis=-1), jnp.stack([sin, cos], axis=-1)], axis=-2
        )  # [n+1, 2, 2]
        cand = (
            jnp.einsum(
                "pc,acd->apd", pts2 - center, rot,
                precision=jax.lax.Precision.HIGHEST,
            )
            + center
        )
        if allow_artifacts:
            valid = jnp.arange(n_angles + 1) < n_angles
        else:
            valid = jnp.all((cand >= 0.0) & (cand < 1.0), axis=(1, 2))
            valid = valid.at[n_angles].set(True)  # angle=0 always safe
        pts2 = cand[_pick_valid(k_rot_pick, valid)]

    # The reference rescales by the image shape before the DLT solve; for
    # the normalized-coords use (shape=[2,2], shift=-1) that is ×2 then
    # -1, i.e. mapping [0,1]² onto [-1,1]².  We express it directly:
    scale = 2.0 if shift else 1.0
    H = homography_from_corners(pts1 * scale + shift, pts2 * scale + shift)
    return H


def sample_homographies(key: jax.Array, n: int, **params) -> jnp.ndarray:
    """[n, 3, 3] batch of homographies (one vmapped PRNG split each)."""
    keys = jax.random.split(key, n)
    return jax.vmap(lambda k: sample_homography(k, **params))(keys)
