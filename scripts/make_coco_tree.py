"""Materialize the synthetic corpus as a COCO-style jpg tree.

Writes ``datasets/COCO240/{train2017,val2017}/<12-digit>.jpg`` from the
deterministic 240x320 synthetic-shapes corpus so the real ``Coco``
reader / HA-export / label-join path (stage 2 -> 3 of the reference
pipeline, README.md:108-177) is exercised end to end at the reference's
resolution without the real dataset.

Usage: python scripts/make_coco_tree.py [--root datasets/COCO240]
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import argparse
from pathlib import Path

import cv2
import numpy as np

from ssp.data.synthetic_dataset import SyntheticShapesDataset

ap = argparse.ArgumentParser()
ap.add_argument("--root", default="datasets/COCO240")
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
    out = Path(args.root) / out_dir
    out.mkdir(parents=True, exist_ok=True)
    for i in range(len(ds)):
        img = np.clip(ds[i]["image"] * 255.0, 0, 255).astype(np.uint8)
        cv2.imwrite(str(out / f"{i:012d}.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 96])
    print(split, len(ds), "->", out, flush=True)
