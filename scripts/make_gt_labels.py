"""Materialize ORACLE detector labels for the COCO240 stand-in tree.

The COCO240 tree (scripts/make_coco_tree.py) is rendered from Synthetic
Shapes, whose ground-truth corner points are known exactly — so the
stage-2 HA pseudo-label npz tree (`predictions/<split>2017/<stem>.npz`,
key ``pts`` = (x, y, conf); reference `export.py:330-352` output
contract) can be produced from the generator itself, without the chip.

Two uses:
  * an HA-free fallback that keeps stage 3/4 training runnable when
    the TPU tunnel is down (label provenance: exact GT, conf = 1.0);
  * an oracle upper bound for auditing HA label quality (compare
    against a real stage-2 export of the same tree).

Usage: python scripts/make_gt_labels.py [--out logs/pipeline240_export_gt/predictions]
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import argparse
from pathlib import Path

import numpy as np

from ssp.data.synthetic_dataset import SyntheticShapesDataset

ap = argparse.ArgumentParser()
ap.add_argument("--out", default="logs/pipeline240_export_gt/predictions")
ap.add_argument("--suffix", default="jointd240")
ap.add_argument("--size", nargs=2, type=int, default=[240, 320])
args = ap.parse_args()

cfg = dict(
    primitives="all",
    truncate={"draw_ellipses": 0.3, "draw_stripes": 0.5, "gaussian_noise": 0.1},
    suffix=args.suffix,
    generation={"split_sizes": {"training": 1500, "validation": 40, "test": 40}},
    preprocessing={"blur_size": 21, "resize": list(args.size)},
)
for split, out_dir in (("train", "train2017"), ("val", "val2017")):
    ds = SyntheticShapesDataset(task=split, **cfg)
    out = Path(args.out) / out_dir
    out.mkdir(parents=True, exist_ok=True)
    for i in range(len(ds)):
        s = ds[i]
        pts = np.asarray(s["points"], np.float32)
        valid = np.asarray(s["points_valid"], bool)
        pts = pts[valid]
        pts3 = np.concatenate(
            [pts, np.ones((len(pts), 1), np.float32)], axis=1)
        np.savez_compressed(out / f"{i:012d}.npz", pts=pts3)
    print(split, len(ds), "->", out, flush=True)
