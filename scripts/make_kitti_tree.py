"""Materialize a KITTI-raw-layout tree from Synthetic Shapes.

Real KITTI raw is not available in this environment; this renders
corner-rich synthetic frames at the reference's KITTI export shape
(384×1248, reference ``configs/magicpoint_kitti_export.yaml``) into
the exact directory layout ``Kitti_inh`` reads —
``<root>/<drive>/image_02/data/<frame>.png`` plus ``train.txt`` /
``val.txt`` split lists (reference ``datasets/Kitti_inh.py:76-85``) —
so the full KITTI lane (HA pseudo-label export + ``export_sequence``
for the SLAM front-end) runs end to end at true reference resolution.

Usage:
  python scripts/make_kitti_tree.py [--root datasets/KITTI_synth]
      [--drives 2] [--frames 10] [--size 384 1248]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import cv2

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

from ssp.data.synthetic_shapes import generate_sample  # noqa: E402

PRIMS = ("draw_checkerboard", "draw_multiple_polygons", "draw_cube",
         "draw_lines", "draw_star", "draw_stripes")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="datasets/KITTI_synth")
    ap.add_argument("--drives", type=int, default=2)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--size", type=int, nargs=2, default=(384, 1248))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--motion", action="store_true",
        help="coherent drives: each drive is ONE composite scene warped "
        "by a smooth homography chain (camera-like motion), with the "
        "ground-truth relative homographies saved as rel_H.json per "
        "drive — so export_sequence output over this tree is evaluable "
        "against known motion (the default static tree renders an "
        "independent scene per frame: a tracker NEGATIVE control).")
    args = ap.parse_args()

    import json

    import numpy as np

    root = Path(args.root)
    h, w = args.size
    train, val = [], []
    for d in range(args.drives + 1):  # last drive is the val split
        drive = f"2026_08_19_drive_{d:04d}_sync_02"
        (val if d == args.drives else train).append(drive)
        frame_dir = root / drive / "image_02" / "data"
        frame_dir.mkdir(parents=True, exist_ok=True)
        n = max(1, args.frames // 2) if d == args.drives else args.frames
        if not args.motion:
            for f in range(n):
                img, _ = generate_sample(
                    PRIMS[(d * args.frames + f) % len(PRIMS)],
                    size=(h, w),
                    seed=args.seed * 1_000_000 + d * 1_000 + f,
                )
                cv2.imwrite(str(frame_dir / f"{f:010d}.png"),
                            (img * 255).astype("uint8"))
            continue
        # coherent drive: tile polygon fields along W for corner
        # density, then chain small rigid+perspective motions
        n_tiles = max(1, w // 320)
        tiles = []
        for t in range(n_tiles):
            tile, _ = generate_sample(
                "draw_multiple_polygons", size=(h, w // n_tiles),
                seed=args.seed * 1_000_000 + d * 1_000 + 31 * t)
            tiles.append(tile)
        base = np.concatenate(tiles, axis=1)
        if base.shape != (h, w):
            base = np.pad(base, ((0, 0), (0, w - base.shape[1])))
        rng = np.random.default_rng(args.seed * 7919 + d)
        T = np.array([[1, 0, -(w - 1) / 2], [0, 1, -(h - 1) / 2],
                      [0, 0, 1.0]])
        H_abs = [np.eye(3)]
        for _ in range(n - 1):
            th = np.radians(rng.uniform(-2.0, 2.0))
            s = rng.uniform(0.98, 1.02)
            tx, ty = rng.uniform(-4, 4, 2)
            M = np.array([
                [s * np.cos(th), -s * np.sin(th), tx],
                [s * np.sin(th), s * np.cos(th), ty],
                [0, 0, 1.0],
            ])
            H_abs.append(np.linalg.inv(T) @ M @ T @ H_abs[-1])
        for f, H in enumerate(H_abs):
            warped = cv2.warpPerspective(base, H.astype(np.float64), (w, h),
                                         flags=cv2.INTER_LINEAR)
            cv2.imwrite(str(frame_dir / f"{f:010d}.png"),
                        (warped * 255).astype("uint8"))
        rel = [(H_abs[t + 1] @ np.linalg.inv(H_abs[t])).tolist()
               for t in range(n - 1)]
        (root / drive / "rel_H.json").write_text(json.dumps(rel))
    (root / "train.txt").write_text("\n".join(train) + "\n")
    (root / "val.txt").write_text("\n".join(val) + "\n")
    print(f"wrote {args.drives}+1 drives x {args.frames} frames ({h}x{w}) to {root}")


if __name__ == "__main__":
    main()
