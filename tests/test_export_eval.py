"""Integration: HPatches export → evaluation chain, HA export, trainer."""

import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest

from ssp.data.hpatches import PatchesDataset
from ssp.models import build_model


def _make_fake_hpatches(root, n_seq=2, hw=(48, 64)):
    """Synthesize HPatches-style sequences: textured 1.ppm + warped
    2..3.ppm with known homographies."""
    rng = np.random.default_rng(0)
    H_img, W_img = hw
    for s in range(n_seq):
        seq = root / (("i_seq" if s % 2 else "v_seq") + str(s))
        seq.mkdir(parents=True)
        base = rng.uniform(0, 255, (H_img, W_img)).astype(np.uint8)
        base = cv2.GaussianBlur(base, (5, 5), 0)
        # cv2 5.x ppm writer requires 3-channel BGR
        cv2.imwrite(str(seq / "1.ppm"), cv2.cvtColor(base, cv2.COLOR_GRAY2BGR))
        for i in (2, 3):
            H = np.eye(3)
            H[0, 2] = rng.uniform(-3, 3)
            H[1, 2] = rng.uniform(-3, 3)
            warped = cv2.warpPerspective(base, H, (W_img, H_img))
            cv2.imwrite(
                str(seq / f"{i}.ppm"), cv2.cvtColor(warped, cv2.COLOR_GRAY2BGR)
            )
            np.savetxt(seq / f"H_1_{i}", H)


class TestHPatchesChain:
    def test_export_then_evaluate(self, tmp_path):
        from ssp.cli.evaluate import evaluate
        from ssp.export.descriptors_export import (
            make_detect_describe_fn,
            run_descriptor_export,
        )

        data_root = tmp_path / "hp"
        _make_fake_hpatches(data_root)
        ds = PatchesDataset(root=data_root, alteration="all")
        assert len(ds) == 4

        model = build_model("SuperPointNet_gauss2", dtype=jnp.float32)
        x = jnp.zeros((1, 48, 64, 1))
        variables = model.init(jax.random.key(0), x, train=False)
        dd_fn = make_detect_describe_fn(
            model.apply, variables, top_k=50, conf_thresh=0.0, subpixel=True
        )
        out_dir = tmp_path / "pred"
        n = run_descriptor_export(dd_fn, iter(ds), out_dir)
        assert n == 4

        with np.load(out_dir / "0.npz") as z:
            assert set(z.files) >= {
                "image", "warped_image", "prob", "warped_prob",
                "desc", "warped_desc", "homography", "matches",
            }
            assert z["desc"].shape[1] == 256

        summary = evaluate(out_dir)
        assert summary["n_files"] == 4
        assert 0.0 <= summary["repeatability"] <= 1.0
        assert 0.0 <= summary["nn_map"] <= 1.0
        assert (out_dir / "result.txt").exists()
        # per-file detail block (reference evaluation.py:468-482)
        txt = (out_dir / "result.txt").read_text()
        assert "====== details =====" in txt and "======== end ========" in txt
        detail = txt.split("====== details =====")[1]
        assert detail.count("file: ") == 4
        assert "; rep: " in detail and "; mscore: " in detail
        with np.load(out_dir / "result.npz") as z:
            assert z["repeatability_per_file"].shape == (4,)
            assert z["correctness_per_file"].shape == (4, 6)
            assert len(z["files"]) == 4

    def test_alteration_filter(self, tmp_path):
        data_root = tmp_path / "hp"
        _make_fake_hpatches(data_root)
        ds_i = PatchesDataset(root=data_root, alteration="i")
        ds_v = PatchesDataset(root=data_root, alteration="v")
        assert len(ds_i) + len(ds_v) == 4
        assert all(p["name"].startswith("i_") for p in ds_i.pairs)


class TestHAExport:
    def test_ha_identity_dominates(self, tmp_path):
        """With a trained-ish detector the HA aggregate should keep the
        strong response; with an untrained net we just require valid
        output + resume semantics (full behavior covered in e2e)."""
        from ssp.export.homography_adaptation import make_ha_fn, run_ha_export

        model = build_model("SuperPointNet_gauss2", dtype=jnp.float32)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 48, 64, 1)), train=False)
        ha = make_ha_fn(model.apply, variables, num_h=4, top_k=20, conf_thresh=0.0)
        rng = np.random.default_rng(0)
        img = rng.uniform(size=(48, 64)).astype(np.float32)
        n = run_ha_export(ha, [("a", img), ("b", img)], tmp_path / "out", group=2)
        assert n == 2
        with np.load(tmp_path / "out" / "a.npz") as z:
            assert z["pts"].shape[1] == 3
        # resume skips
        assert run_ha_export(ha, [("a", img)], tmp_path / "out") == 0

    def test_ha_chunk_not_dividing_total(self, tmp_path):
        """A chunk that does not divide G·num_h must clamp the final
        slice, not crash (lax.slice rejects out-of-bounds limits)."""
        from ssp.export.homography_adaptation import make_ha_fn

        model = build_model("SuperPointNet_gauss2", dtype=jnp.float32)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 48, 64, 1)), train=False)
        ha = make_ha_fn(
            model.apply, variables, num_h=5, chunk=3, top_k=10, conf_thresh=0.0
        )
        img = jnp.asarray(
            np.random.default_rng(0).uniform(size=(48, 64)).astype(np.float32)
        )
        pts, valid = ha(jax.random.key(1), img)
        assert np.isfinite(np.asarray(pts)).all()

    def test_ha_one_dispatch_matches_staged(self):
        """The single-program (lax.scan) HA and the staged-jit HA are the
        same math — results must agree to fp32 accumulation order."""
        from ssp.export.homography_adaptation import make_ha_fn

        model = build_model("SuperPointNet_gauss2", dtype=jnp.float32)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 48, 64, 1)), train=False)
        kw = dict(num_h=6, chunk=4, top_k=20, conf_thresh=0.0)
        ha_one = make_ha_fn(model.apply, variables, one_dispatch=True, **kw)
        ha_staged = make_ha_fn(model.apply, variables, one_dispatch=False, **kw)
        rng = np.random.default_rng(5)
        imgs = jnp.asarray(rng.uniform(size=(3, 48, 64)).astype(np.float32))
        keys = jax.random.split(jax.random.key(9), 3)
        pts_a, val_a = ha_one(keys, imgs)
        pts_b, val_b = ha_staged(keys, imgs)
        np.testing.assert_array_equal(np.asarray(val_a), np.asarray(val_b))
        np.testing.assert_allclose(
            np.asarray(pts_a), np.asarray(pts_b), atol=1e-4
        )

    def test_ha_resume_assigns_same_homographies(self, tmp_path):
        """Interrupted-then-resumed exports must produce the same
        pseudo-labels as a fresh run with the same seed (per-image PRNG
        is positional, not sequential-split)."""
        from ssp.export.homography_adaptation import make_ha_fn, run_ha_export

        model = build_model("SuperPointNet_gauss2", dtype=jnp.float32)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 48, 64, 1)), train=False)
        ha = make_ha_fn(model.apply, variables, num_h=3, top_k=10, conf_thresh=0.0)
        rng = np.random.default_rng(2)
        imgs = [(f"i{k}", rng.uniform(size=(48, 64)).astype(np.float32))
                for k in range(3)]
        run_ha_export(ha, imgs, tmp_path / "fresh", seed=7)
        # "interrupted" run: first image already exported, rest resume
        run_ha_export(ha, imgs[:1], tmp_path / "resumed", seed=7)
        run_ha_export(ha, imgs, tmp_path / "resumed", seed=7)
        for name, _ in imgs:
            with np.load(tmp_path / "fresh" / f"{name}.npz") as a, \
                    np.load(tmp_path / "resumed" / f"{name}.npz") as b:
                np.testing.assert_allclose(a["pts"], b["pts"])

    def test_descriptor_export_counts_only_new_writes(self, tmp_path):
        from ssp.export.descriptors_export import (
            make_detect_describe_fn, run_descriptor_export,
        )

        model = build_model("SuperPointNet_gauss2", dtype=jnp.float32)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 48, 64, 1)), train=False)
        dd = make_detect_describe_fn(
            model.apply, variables, top_k=20, conf_thresh=0.0, nms_radius=4,
        )
        rng = np.random.default_rng(1)
        pair = {
            "image": rng.uniform(size=(48, 64)).astype(np.float32),
            "warped_image": rng.uniform(size=(48, 64)).astype(np.float32),
            "homography": np.eye(3),
        }
        assert run_descriptor_export(dd, [pair], tmp_path / "d") == 1
        assert run_descriptor_export(dd, [pair], tmp_path / "d") == 0


class TestRepeatabilityProtocol:
    def test_translation_case(self):
        from ssp.evaluations import compute_repeatability

        rng = np.random.default_rng(1)
        pts1 = np.concatenate(
            [rng.uniform(10, 40, (30, 2)), rng.uniform(0.5, 1.0, (30, 1))], axis=1
        )
        H = np.eye(3)
        H[0, 2] = 5.0  # pure translation
        pts2 = pts1.copy()
        pts2[:, 0] += 5.0
        r = compute_repeatability(pts1, pts2, H, (64, 64))
        assert r["repeatability"] == 1.0
        assert r["localization_err"] == pytest.approx(0.0, abs=1e-5)

    def test_differing_image_sizes(self):
        """Keypoints of image 1 are filtered against image 2's bounds
        (and vice versa) — un-resized HPatches pairs differ in size."""
        from ssp.evaluations import compute_repeatability

        # image1 is 64 wide, image2 is 96 wide, H translates x by +40:
        # (50, 10) warps to (90, 10) — inside image 2 but beyond
        # image 1's width, so filtering warped pts1 against image 1's
        # shape (the old behavior) wrongly discards it
        H = np.eye(3)
        H[0, 2] = 40.0
        pts1 = np.array([[50.0, 10.0, 1.0]])
        pts2 = np.array([[90.0, 10.0, 1.0]])
        r = compute_repeatability(
            pts1, pts2, H, (64, 64), shape2_hw=(64, 96)
        )
        assert r["count1"] == 1 and r["count2"] == 1
        assert r["repeatability"] == 1.0


class TestReferenceCSVRow:
    def test_schema_matches_reference(self):
        """results_ref.csv rows carry the reference's exact header and
        stringified formats (export_eval.py:345-355, 710-719)."""
        from ssp.cli.export_eval import REF_CSV_FIELDS, reference_row
        from ssp.cli.evaluate import HOMOGRAPHY_THRESH

        summary = {
            "repeatability": 0.6, "localization_err": 1.0,
            "nn_map": 0.86, "matching_score": 0.52,
            **{f"correctness_{e}": 0.1 * i
               for i, e in enumerate(HOMOGRAPHY_THRESH)},
        }
        row = reference_row("ckpts/superPointNet_170000", summary)
        assert list(row) == REF_CSV_FIELDS
        assert row["path"] == "ckpts/superPointNet_170000"
        assert row["repeatability"] == 0.6
        # stringified exactly as the reference writes them
        assert row["homography threshold"] == str(list(HOMOGRAPHY_THRESH))
        assert row["nn mean AP"] == "0.86"
        corr = eval(row["Average correctness"])
        assert len(corr) == len(HOMOGRAPHY_THRESH)
