"""Numeric parity vs torch oracles of the reference formulas.

Each oracle below is an independent torch implementation of a reference
formula (cited file:line), written from the spec — NOT a copy of the
reference code.  Both frameworks get identical inputs; losses must match
to fp32 tolerance.  This turns "within 1% of the PyTorch model" into a
regression test that runs without COCO or reference checkpoints.

Covered:
  * labels2Dto3D (+dustbin+norm)      — utils/utils.py:408-440
  * detector BCE loss                 — Train_model_heatmap_all.py:155-179
  * flattenDetection                  — utils/utils.py:515-560
  * dense descriptor hinge loss       — utils/utils.py:779-893
  * sparse descriptor loss            — utils/loss_functions/sparse_loss.py:65-284
  * semantic CE (ignore 133)          — Train_model_heatmap_all.py:181-193
  * Kendall multi-task loss           — Train_model_heatmap_all.py:46-77
  * HA combine (mask+warp-back+agg)   — export.py:49-59
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from ssp.core.grid import flatten_detection, labels_to_cells
from ssp.core.homography import inv3, sample_homography, warp_points
from ssp.core.warp import compute_valid_mask, inv_warp_image
from ssp.losses.detector import detector_loss
from ssp.losses.descriptor_dense import descriptor_loss_dense
from ssp.losses.descriptor_sparse import descriptor_loss_sparse
from ssp.losses.multitask import multi_task_loss
from ssp.losses.semantic import semantic_loss

CELL = 8


# ---------------------------------------------------------------- oracles


def oracle_labels2Dto3D(labels_2d_t: torch.Tensor) -> torch.Tensor:
    """[B, 1, H, W] → [B, 65, Hc, Wc]: pixel_unshuffle + dustbin for empty
    cells + per-cell normalization (utils/utils.py:408-440)."""
    cells = F.pixel_unshuffle(labels_2d_t, CELL)  # [B, 64, Hc, Wc]
    occupied = cells.sum(dim=1, keepdim=True)
    dustbin = (occupied < 1.0).float()
    full = torch.cat([cells, dustbin], dim=1)
    return full / full.sum(dim=1, keepdim=True)


def oracle_detector_loss(semi_t, target_t, mask_t) -> torch.Tensor:
    """Masked BCE over softmax(semi) (Train_model_heatmap_all.py:170-179)."""
    p = torch.softmax(semi_t, dim=1)
    bce = F.binary_cross_entropy(p, target_t, reduction="none")
    return (bce.sum(dim=1) * mask_t).sum() / (mask_t.sum() + 1e-5)


def oracle_flatten_detection(semi_t) -> torch.Tensor:
    """softmax(65) → drop dustbin → depth-to-space (utils/utils.py:515-560)."""
    dense = torch.softmax(semi_t, dim=1)
    return F.pixel_shuffle(dense[:, :-1], CELL)


def oracle_dense_descriptor_loss(
    d1_t, d2_t, H_t, cell_mask_t, lamda_d=250.0, descriptor_dist=4.0
):
    """All-pairs hinge (utils/utils.py:779-893).  d1/d2: [B, D, Hc, Wc];
    H: [B, 3, 3] normalized (x/S·2−1) image1→image2; cell_mask:
    [B, Hc, Wc] validity of image-2 cells."""
    B, D, Hc, Wc = d1_t.shape
    H_img, W_img = Hc * CELL, Wc * CELL
    ys, xs = torch.meshgrid(
        torch.arange(Hc).float(), torch.arange(Wc).float(), indexing="ij"
    )
    centres = torch.stack([xs, ys], -1).reshape(-1, 2) * CELL + CELL // 2
    # normalize (x/W·2−1 convention, matching the reference's normPts)
    scale = torch.tensor([W_img, H_img]).float()
    c_n = centres / scale * 2.0 - 1.0
    c_h = torch.cat([c_n, torch.ones(len(c_n), 1)], -1)  # [N, 3]
    w = torch.einsum("bij,nj->bni", H_t.float(), c_h)
    w = w[..., :2] / w[..., 2:3]
    w_pix = (w + 1.0) / 2.0 * scale
    dist = torch.cdist(w_pix, centres.unsqueeze(0).expand(B, -1, -1))
    corr = (dist <= descriptor_dist).float()  # [B, N(i=warped c1), N(j=c2)]

    f1 = d1_t.reshape(B, D, -1).transpose(1, 2)  # [B, N, D]
    f2 = d2_t.reshape(B, D, -1).transpose(1, 2)
    dot = torch.bmm(f1, f2.transpose(1, 2))  # [B, N, N]
    pos = torch.clamp(1.0 - dot, min=0.0)
    neg = torch.clamp(dot - 0.2, min=0.0)
    vm = cell_mask_t.reshape(B, 1, -1).float()
    norm = B * (cell_mask_t.sum() + 1) * Hc * Wc
    pos_sum = (lamda_d * corr * pos * vm).sum() / norm
    neg_sum = ((1 - corr) * neg * vm).sum() / norm
    return pos_sum + neg_sum, pos_sum, neg_sum


def oracle_sparse_loss(
    d1_t, d2_t, H_t, *, n_match, n_non_per_match, lamda_d, seed
):
    """Sparse loss expectation oracle (sparse_loss.py:65-256):
    warp all cell coords by H conjugated to cell units, round, filter,
    sample n_match (without replacement up to pool size), cos hinge mean;
    non-matches = random cells, hinge sum/(num_hard+1)."""
    g = torch.Generator().manual_seed(seed)
    D, Hc, Wc = d1_t.shape
    ys, xs = torch.meshgrid(
        torch.arange(Hc).float(), torch.arange(Wc).float(), indexing="ij"
    )
    uv_a = torch.stack([xs, ys], -1).reshape(-1, 2)
    # conjugate normalized H into cell units: T x_cell → normalized
    T = torch.tensor(
        [[2.0 / Wc, 0.0, -1.0], [0.0, 2.0 / Hc, -1.0], [0.0, 0.0, 1.0]]
    )
    Hc_mat = torch.inverse(T) @ H_t.float() @ T
    homo = torch.cat([uv_a, torch.ones(len(uv_a), 1)], -1)
    w = (Hc_mat @ homo.T).T
    uv_b = torch.round(w[:, :2] / w[:, 2:3])
    ok = (
        (uv_b[:, 0] >= 0) & (uv_b[:, 0] <= Wc - 1)
        & (uv_b[:, 1] >= 0) & (uv_b[:, 1] <= Hc - 1)
    )
    uv_a, uv_b = uv_a[ok], uv_b[ok]
    pool = len(uv_a)
    idx = torch.randperm(pool, generator=g)
    idx = idx[torch.randint(0, pool, (n_match,), generator=g)] \
        if pool < n_match else idx[:n_match]
    uv_a, uv_b = uv_a[idx], uv_b[idx]

    f1 = d1_t.reshape(D, -1).T  # [N, D]
    f2 = d2_t.reshape(D, -1).T
    ia = (uv_a[:, 0] + uv_a[:, 1] * Wc).long()
    ib = (uv_b[:, 0] + uv_b[:, 1] * Wc).long()
    match = torch.clamp(1.0 - (f1[ia] * f2[ib]).sum(-1), min=0.0).mean()

    nm = torch.randint(0, Hc * Wc, (n_match, n_non_per_match), generator=g)
    d_a = f1[ia][:, None, :]
    d_b = f2[nm.reshape(-1)].reshape(n_match, n_non_per_match, D)
    hinge = torch.clamp((d_a * d_b).sum(-1) - 0.2, min=0.0)
    num_hard = (hinge > 0).sum()
    non_match = hinge.sum() / (num_hard + 1)
    return lamda_d * match + non_match, match, non_match


def oracle_combine_heatmap(heat_t, masks_t, Hs_inv_t):
    """HA combine (export.py:49-59): heat·mask → bilinear back-warp →
    Σheat / Σmask.  Returns (agg, stacked back-warped masks)."""
    N, H, W = heat_t.shape
    ys = torch.linspace(-1, 1, H)
    xs = torch.linspace(-1, 1, W)
    gy, gx = torch.meshgrid(ys, xs, indexing="ij")
    pts = torch.stack([gx, gy, torch.ones_like(gx)], -1).reshape(-1, 3)
    hm = (heat_t * masks_t).unsqueeze(1)  # [N, 1, H, W]
    src = torch.einsum("nij,pj->npi", Hs_inv_t.float(), pts)
    grid = (src[..., :2] / src[..., 2:3]).reshape(N, H, W, 2)
    back_h = F.grid_sample(hm, grid, mode="bilinear", padding_mode="zeros",
                           align_corners=True)[:, 0]
    back_m = F.grid_sample(masks_t.unsqueeze(1), grid, mode="bilinear",
                           padding_mode="zeros", align_corners=True)[:, 0]
    return back_h.sum(0) / back_m.sum(0), back_m


# ------------------------------------------------------------------ tests


def _rand_labels(rng, B, H, W, density=0.01):
    return (rng.uniform(size=(B, H, W, 1)) < density).astype(np.float32)


class TestDetectorParity:
    def test_labels2dto3d(self):
        rng = np.random.default_rng(0)
        lab = _rand_labels(rng, 2, 48, 64)
        mine = np.asarray(labels_to_cells(jnp.asarray(lab)))
        # NHWC → NCHW for the oracle
        oracle = oracle_labels2Dto3D(
            torch.from_numpy(lab).permute(0, 3, 1, 2)
        ).numpy()
        # channel ordering: mine is NHWC with channel last
        np.testing.assert_allclose(
            mine.transpose(0, 3, 1, 2), oracle, atol=1e-6
        )

    def test_detector_loss_value(self):
        rng = np.random.default_rng(1)
        B, H, W = 2, 48, 64
        lab = _rand_labels(rng, B, H, W)
        semi_logits = rng.normal(0, 2.0, (B, H // 8, W // 8, 65)).astype(np.float32)
        mask = (rng.uniform(size=(B, H // 8, W // 8)) > 0.2).astype(np.float32)

        cells = labels_to_cells(jnp.asarray(lab))
        mine = float(detector_loss(jnp.asarray(semi_logits), cells, jnp.asarray(mask)))

        target = oracle_labels2Dto3D(torch.from_numpy(lab).permute(0, 3, 1, 2))
        oracle = float(oracle_detector_loss(
            torch.from_numpy(semi_logits).permute(0, 3, 1, 2), target,
            torch.from_numpy(mask),
        ))
        assert mine == pytest.approx(oracle, rel=1e-4)

    def test_flatten_detection(self):
        rng = np.random.default_rng(2)
        semi = rng.normal(0, 1.5, (2, 6, 8, 65)).astype(np.float32)
        mine = np.asarray(flatten_detection(jnp.asarray(semi)))
        oracle = oracle_flatten_detection(
            torch.from_numpy(semi).permute(0, 3, 1, 2)
        ).numpy()
        np.testing.assert_allclose(
            mine.transpose(0, 3, 1, 2), oracle, atol=1e-5
        )


class TestDenseDescriptorParity:
    def test_loss_and_terms(self):
        rng = np.random.default_rng(3)
        B, Hc, Wc, D = 2, 6, 8, 32
        d1 = rng.normal(size=(B, Hc, Wc, D)).astype(np.float32)
        d2 = rng.normal(size=(B, Hc, Wc, D)).astype(np.float32)
        d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
        d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
        Hs = np.stack([
            np.asarray(sample_homography(jax.random.key(s))) for s in range(B)
        ])
        mask = (rng.uniform(size=(B, Hc, Wc)) > 0.15).astype(np.float32)

        loss, _, pos, neg = descriptor_loss_dense(
            jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(Hs), jnp.asarray(mask),
            lambda_d=250.0, descriptor_dist=4.0,
        )
        o_loss, o_pos, o_neg = oracle_dense_descriptor_loss(
            torch.from_numpy(d1).permute(0, 3, 1, 2),
            torch.from_numpy(d2).permute(0, 3, 1, 2),
            torch.from_numpy(Hs), torch.from_numpy(mask),
        )
        assert float(pos) == pytest.approx(float(o_pos), rel=1e-3)
        assert float(neg) == pytest.approx(float(o_neg), rel=1e-3)
        assert float(loss) == pytest.approx(float(o_loss), rel=1e-3)


class TestSparseDescriptorParity:
    def test_degenerate_identical_descriptors(self):
        """All-equal normalized descriptors + identity H: the sparse loss
        is analytic (match = 0; every non-match is hard with hinge 0.8) —
        sampling-independent, so values must agree exactly."""
        Hc, Wc, D = 6, 8, 16
        v = np.ones((D,), np.float32) / np.sqrt(D)
        d = np.broadcast_to(v, (Hc, Wc, D)).astype(np.float32)
        M, N = 100, 10
        total, match, non_match = descriptor_loss_sparse(
            jax.random.key(0), jnp.asarray(d), jnp.asarray(d), jnp.eye(3),
            num_matching_attempts=M, num_masked_non_matches_per_match=N,
            lamda_d=1.0,
        )
        dt = torch.from_numpy(np.ascontiguousarray(d)).permute(2, 0, 1)
        o_total, o_match, o_nm = oracle_sparse_loss(
            dt, dt, torch.eye(3), n_match=M, n_non_per_match=N,
            lamda_d=1.0, seed=0,
        )
        expected_nm = 0.8 * M * N / (M * N + 1)
        assert float(match) == pytest.approx(0.0, abs=1e-6)
        assert float(o_match) == pytest.approx(0.0, abs=1e-6)
        assert float(non_match) == pytest.approx(expected_nm, rel=1e-5)
        assert float(o_nm) == pytest.approx(expected_nm, rel=1e-5)
        assert float(total) == pytest.approx(float(o_total), rel=1e-5)

    def test_expectation_parity_random_descriptors(self):
        """Random descriptors: RNG streams differ, so compare Monte-Carlo
        expectations of match / non-match losses across seeds."""
        rng = np.random.default_rng(4)
        Hc, Wc, D = 12, 16, 32
        d1 = rng.normal(size=(Hc, Wc, D)).astype(np.float32)
        d2 = rng.normal(size=(Hc, Wc, D)).astype(np.float32)
        d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
        d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
        Hm = np.asarray(sample_homography(jax.random.key(7)))
        M, N = 1000, 30

        mine_m, mine_n = [], []
        orac_m, orac_n = [], []
        d1t = torch.from_numpy(d1).permute(2, 0, 1).contiguous()
        d2t = torch.from_numpy(d2).permute(2, 0, 1).contiguous()
        for seed in range(6):
            _, m, n = descriptor_loss_sparse(
                jax.random.key(seed), jnp.asarray(d1), jnp.asarray(d2),
                jnp.asarray(Hm), num_matching_attempts=M,
                num_masked_non_matches_per_match=N, lamda_d=1.0, method="1d",
            )
            mine_m.append(float(m))
            mine_n.append(float(n))
            _, om, on = oracle_sparse_loss(
                d1t, d2t, torch.from_numpy(Hm.copy()), n_match=M,
                n_non_per_match=N, lamda_d=1.0, seed=seed,
            )
            orac_m.append(float(om))
            orac_n.append(float(on))
        assert np.mean(mine_m) == pytest.approx(np.mean(orac_m), abs=0.03)
        # non-match means are sums/(hard+1) ≈ mean hinge over hard pairs
        assert np.mean(mine_n) == pytest.approx(np.mean(orac_n), rel=0.05)


class TestSemanticAndMultiTaskParity:
    def test_semantic_ce_ignore(self):
        rng = np.random.default_rng(5)
        B, H, W, C = 2, 16, 16, 7
        logits = rng.normal(size=(B, H, W, C)).astype(np.float32)
        labels = rng.integers(0, C, (B, H, W))
        labels[0, :4] = 133  # ignored region
        mine = float(semantic_loss(jnp.asarray(logits), jnp.asarray(labels),
                                   ignore_class=133))
        oracle = float(F.cross_entropy(
            torch.from_numpy(logits).permute(0, 3, 1, 2),
            torch.from_numpy(labels).long(), ignore_index=133,
        ))
        assert mine == pytest.approx(oracle, rel=1e-5)

    def test_kendall_formula(self):
        etas = torch.tensor([0.7, -0.3, 1.4], requires_grad=False)
        l_det, l_pos, l_neg, l_sem = 2.0, 0.5, 0.25, 1.5
        oracle = float(
            l_det * torch.exp(-etas[0]) + etas[0]
            + 0.5 * (l_pos + l_neg) * torch.exp(-etas[1]) + 0.5 * etas[1]
            + l_sem * torch.exp(-etas[2]) + etas[2]
        )
        mine = float(multi_task_loss(
            jnp.asarray(etas.numpy()), l_det, l_pos, l_neg, l_sem
        ))
        assert mine == pytest.approx(oracle, rel=1e-6)


class TestHACombineParity:
    def test_combine_matches_torch_grid_sample(self):
        """Back-warp + Σheat/Σmask aggregation vs the torch oracle.  The
        framework uses closed-form binary back-masks where the reference
        bilinearly warps the mask; they agree everywhere the bilinear
        mask is binary, so comparison excludes the fractional boundary
        band (sub-pixel wide per warp)."""
        rng = np.random.default_rng(6)
        Nw, H, W = 8, 48, 64
        heat = rng.uniform(size=(Nw, H, W)).astype(np.float32)
        Hs = [np.eye(3, dtype=np.float32)]
        for s in range(Nw - 1):
            Hs.append(np.asarray(sample_homography(
                jax.random.key(100 + s), shift=-1.0,
                perspective_amplitude_x=0.15, perspective_amplitude_y=0.15,
                scaling_amplitude=0.2, patch_ratio=0.8,
            ), dtype=np.float32))
        Hs = np.stack(Hs)
        Hs_inv = np.stack([np.linalg.inv(h) for h in Hs]).astype(np.float32)
        masks = np.stack([
            np.asarray(compute_valid_mask((H, W), jnp.asarray(h), 0))
            for h in Hs
        ]).astype(np.float32)

        # framework combine (forward_stage semantics,
        # ssp/export/homography_adaptation.py:119-136)
        hm = jnp.asarray(heat * masks)
        back = jax.vmap(
            lambda h, Hm: inv_warp_image(h[..., None], Hm)[..., 0]
        )(hm, jnp.asarray(Hs_inv))
        mask_back = jax.vmap(
            lambda Hm: compute_valid_mask((H, W), Hm, 0)
        )(jnp.asarray(Hs_inv))
        agg = np.asarray(back.sum(0) / (mask_back.sum(0) + 1e-6))

        o_agg, o_masks = oracle_combine_heatmap(
            torch.from_numpy(heat), torch.from_numpy(masks),
            torch.from_numpy(Hs_inv),
        )
        o_masks = o_masks.numpy()
        binary = np.all((o_masks < 1e-6) | (o_masks > 1 - 1e-6), axis=0)
        covered = o_masks.sum(0) > 0.5
        compare = binary & covered
        assert compare.mean() > 0.5  # the band must stay thin
        diff = np.abs(agg[compare] - o_agg.numpy()[compare])
        assert diff.max() < 2e-4
