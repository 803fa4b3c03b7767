"""Materialize semantic PNGs for the COCO240 tree.

Real COCO panoptic annotations aren't available in this environment, so
the per-pixel signal is intensity-quantized pseudo-classes written as
*raw panoptic category ids* — the exact on-disk contract `Coco_sem`
consumes (`<sem_labels>/semantic_<split>2017/<stem>.png`, reference
`datasets/Coco_sem.py:200-216`): ids pass through the built-in
133-class `label_mapping`, so this exercises the real remap path.

Bin 0 (darkest pixels) is written as raw id 0, which the table maps to
the ignore class 133 — the masked-CE ignore path sees real traffic.
Bins 1..N map to raw ids 1..N (train ids 0..N-1).

Usage: python scripts/make_coco_sem_labels.py [--root datasets/COCO240]
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import argparse
from pathlib import Path

import cv2
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--root", default="datasets/COCO240")
ap.add_argument("--classes", type=int, default=6, help="non-ignore bins")
args = ap.parse_args()

root = Path(args.root)
qs = np.linspace(0, 1, args.classes + 2)[1:-1]  # +1 edge for the ignore bin
for split in ("train2017", "val2017"):
    img_dir = root / split
    out_dir = root / "annotations" / f"semantic_{split}"
    out_dir.mkdir(parents=True, exist_ok=True)
    files = sorted(img_dir.glob("*.jpg"))
    for f in files:
        img = cv2.imread(str(f), cv2.IMREAD_GRAYSCALE)
        edges = np.quantile(img, qs)
        # digitize → 0..classes; 0 becomes raw id 0 (→ ignore 133)
        raw = np.digitize(img, edges).astype(np.uint8)
        cv2.imwrite(str(out_dir / f"{f.stem}.png"), raw)
    print(split, len(files), "->", out_dir, flush=True)
