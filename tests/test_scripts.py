"""The repo scripts are part of the reproducibility story — smoke them."""

import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent


class TestMakeSynthHPatches:
    def test_generates_readable_corpus(self, tmp_path):
        out = tmp_path / "hp"
        r = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "make_synth_hpatches.py"),
             str(out), "--n-seq", "4", "--size", "48", "64"],
            capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-500:]
        from ssp.data.hpatches import PatchesDataset

        ds = PatchesDataset(root=out, alteration="all")
        assert len(ds) == 8
        s = ds[0]
        assert s["image"].shape == (48, 64)
        # ground-truth H actually maps content: warp ref corners and
        # verify they stay finite/plausible
        H = s["homography"]
        c = np.array([[0, 0, 1], [63, 47, 1]], float) @ H.T
        assert np.isfinite(c).all() and (np.abs(c[:, :2] / c[:, 2:]) < 500).all()


class TestSemanticDemoHelpers:
    def test_quantize_sem_classes(self):
        sys.path.insert(0, str(REPO / "scripts"))
        from train_semantic_demo import quantize_sem

        rng = np.random.default_rng(0)
        imgs = rng.uniform(size=(2, 16, 16)).astype(np.float32)
        sem = quantize_sem(imgs, 4)
        assert sem.shape == imgs.shape and sem.dtype == np.int32
        assert set(np.unique(sem)) <= {0, 1, 2, 3}
        # quantiles → roughly balanced classes
        counts = np.bincount(sem.ravel(), minlength=4) / sem.size
        assert counts.min() > 0.15
