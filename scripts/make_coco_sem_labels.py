"""Materialize semantic PNGs for the COCO240 tree.

Real COCO panoptic annotations aren't available in this environment, so
the per-pixel signal is intensity-quantized pseudo-classes written as
*raw panoptic category ids* — the exact on-disk contract `Coco_sem`
consumes (`<sem_labels>/semantic_<split>2017/<stem>.png`, reference
`datasets/Coco_sem.py:200-216`): ids pass through the built-in
133-class `label_mapping`, so this exercises the real remap path.

The intensity→class mapping is one FIXED global LUT shared by every
image and split: the (gaussian-smoothed) gray value is split into 134
uniform bins — bin 0 is written as raw id 0 (→ ignore class 133, so the
masked-CE ignore path sees real traffic) and bins 1..133 map to the 133
REAL panoptic category ids of the built-in table in order.  Fixed +
global is deliberate: every one of the 133 train classes receives
traffic (full-width CE), *and* the task is learnable — the class of a
pixel is a deterministic function of its local appearance, so sem loss
/ mIoU trajectories are meaningful.  (An earlier per-image-rotated
variant had full class traffic but no image-independent signal, pinning
CE at ln 133.)  Smoothing (sigma 4) makes label regions contiguous,
segmentation-like blobs rather than per-pixel speckle.

Usage: python scripts/make_coco_sem_labels.py [--root datasets/COCO240]
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import argparse
from pathlib import Path

import cv2
import numpy as np

from ssp.data.coco_labels import N_CLASSES, PANOPTIC_IDS

ap = argparse.ArgumentParser()
ap.add_argument("--root", default="datasets/COCO240")
ap.add_argument("--sigma", type=float, default=4.0, help="pre-LUT smoothing")
ap.add_argument(
    "--coarse", type=int, default=0, metavar="N",
    help="coarse mode: N well-separated appearance classes mapped onto N "
    "real panoptic ids, quantization-boundary gray values -> ignore. The "
    "134-bin default puts exact-bin accuracy at the quantization floor "
    "(~1.9 gray-levels/bin); in coarse mode a working head MUST score "
    "high (round-3 VERDICT weak #1), so its mIoU is a meaningful "
    "pass/fail signal.")
ap.add_argument("--out-name", default="annotations",
                help="annotations dir name under --root")
args = ap.parse_args()

ids = np.asarray(PANOPTIC_IDS, np.uint8)
lut = np.zeros(256, np.uint8)
if args.coarse:
    # N wide gray bands; the central 10/16 of each band maps to one real
    # panoptic id (spread across the id table so the remap is
    # non-trivial), band-boundary values -> raw 0 (ignore class 133)
    n = args.coarse
    band_w = 256 // n
    g = np.arange(256)
    band = np.minimum(g // band_w, n - 1)
    pos = g - band * band_w
    guard = max(band_w // 8, 1)
    central = (pos >= guard) & (pos < band_w - guard)
    spread = np.linspace(0, N_CLASSES - 1, n).astype(int)
    lut[central] = ids[spread[band[central]]]
else:
    # fixed global LUT: 256 gray values → 134 uniform bins → raw ids
    bin_of = (np.arange(256) * (N_CLASSES + 1)) // 256  # 0..133
    lut[bin_of > 0] = ids[bin_of[bin_of > 0] - 1]

root = Path(args.root)
for split in ("train2017", "val2017"):
    img_dir = root / split
    out_dir = root / args.out_name / f"semantic_{split}"
    out_dir.mkdir(parents=True, exist_ok=True)
    files = sorted(img_dir.glob("*.jpg"))
    for f in files:
        img = cv2.imread(str(f), cv2.IMREAD_GRAYSCALE)
        sm = cv2.GaussianBlur(img, (0, 0), args.sigma)
        cv2.imwrite(str(out_dir / f"{f.stem}.png"), lut[sm])
    print(split, len(files), "->", out_dir, flush=True)
