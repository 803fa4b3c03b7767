"""Materialize an HPatches-layout evaluation corpus from Synthetic Shapes.

Real HPatches isn't available in this environment; this renders
corner-rich synthetic scenes and warps each with known mild
homographies (HPatches-like viewpoint changes: ≤8° rotation, ≤10%
scale, small perspective) into the directory layout `PatchesDataset`
reads — `<seq>/1.ppm`, `<seq>/<i>.ppm`, `<seq>/H_1_<i>` — so the full
stage-4 export→evaluate chain runs end to end on exact ground truth.

Usage:
  python scripts/make_synth_hpatches.py datasets/HPatches_synth \
      --n-seq 40 --size 240 320 [--strong]

`--strong` samples harder warps (±30° rotation, 25% scale) for
robustness sweeps.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import cv2
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root


def mild_homography(rng: np.random.Generator, strong: bool = False) -> np.ndarray:
    """Pixel-coordinate homography for HPatches-like viewpoint change."""
    max_rot, max_scale, max_t, persp = (
        (30.0, 0.25, 30.0, 1e-4) if strong else (8.0, 0.10, 15.0, 5e-5)
    )
    th = np.radians(rng.uniform(-max_rot, max_rot))
    s = rng.uniform(1.0 - max_scale, 1.0 + max_scale)
    tx, ty = rng.uniform(-max_t, max_t, 2)
    return np.array([
        [s * np.cos(th), -s * np.sin(th), tx],
        [s * np.sin(th), s * np.cos(th), ty],
        [rng.uniform(-persp, persp), rng.uniform(-persp, persp), 1.0],
    ])


def center_conjugate(H: np.ndarray, h: int, w: int) -> np.ndarray:
    """Apply the warp about the image centre (keeps content in frame)."""
    T = np.array([[1, 0, -(w - 1) / 2], [0, 1, -(h - 1) / 2], [0, 0, 1.0]])
    return np.linalg.inv(T) @ H @ T


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--n-seq", type=int, default=40)
    ap.add_argument("--pairs", type=int, default=2, help="warped views per sequence")
    ap.add_argument("--size", type=int, nargs=2, default=(240, 320))
    ap.add_argument("--strong", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from ssp.data.synthetic_shapes import generate_sample

    out = Path(args.out)
    h, w = args.size
    rng = np.random.default_rng(args.seed)
    # corner-rich primitives only — the ε=1 investigation established
    # that scenes with ~8 corners can't support 1 px homography
    # estimation (tests/test_known_h_oracle.py)
    prims = ["draw_checkerboard", "draw_multiple_polygons", "draw_cube", "draw_stripes"]
    for s in range(args.n_seq):
        prim = prims[s % len(prims)]
        img, _ = generate_sample(prim, size=(h, w), seed=args.seed * 100_000 + s)
        img_u8 = (img * 255).astype(np.uint8)
        seq = out / f"v_{prim.removeprefix('draw_')}_{s:03d}"
        seq.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(seq / "1.ppm"), cv2.cvtColor(img_u8, cv2.COLOR_GRAY2BGR))
        for i in range(2, 2 + args.pairs):
            H = center_conjugate(mild_homography(rng, args.strong), h, w)
            warped = cv2.warpPerspective(img_u8, H, (w, h), flags=cv2.INTER_LINEAR)
            cv2.imwrite(str(seq / f"{i}.ppm"), cv2.cvtColor(warped, cv2.COLOR_GRAY2BGR))
            np.savetxt(seq / f"H_1_{i}", H)
    print(f"wrote {args.n_seq} sequences x {args.pairs} pairs to {out}")


if __name__ == "__main__":
    main()
