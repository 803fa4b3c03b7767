"""HPatches evaluation pairs (reference ``datasets/patches_dataset.py``).

Each sequence directory holds ``1.ppm`` plus warped views ``2..6.ppm``
with ground-truth homographies ``H_1_<i>``; the dataset yields up to 5
(reference, warped, H) pairs per sequence.  ``alteration`` filters to
illumination (``i``) or viewpoint (``v``) sequences.  When a resize is
configured, H is conjugated into the resized frame
(``patches_dataset.py:101-113``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

from ssp.data.base import ImageDataset, read_gray
from ssp.registry import register
from ssp.utils.experiment import settings_paths


def _scale_homography_pixels(H: np.ndarray, shape_from, shape_to) -> np.ndarray:
    """Conjugate a pixel-coordinate H from ``shape_from`` (H, W) images
    into ``shape_to`` images: S · H · S⁻¹ with the axis-ratio scaling."""
    sy = shape_to[0] / shape_from[0]
    sx = shape_to[1] / shape_from[1]
    S = np.diag([sx, sy, 1.0])
    return S @ H @ np.linalg.inv(S)


@register("dataset", "hpatches", "PatchesDataset", "patches_dataset")
class PatchesDataset(ImageDataset):
    def __init__(
        self,
        task: str = "test",
        root: Optional[Path] = None,
        alteration: str = "all",
        preprocessing: Optional[Dict[str, Any]] = None,
        **_unused: Any,
    ):
        self.root = Path(root) if root else settings_paths()["DATA_PATH"] / "HPatches"
        self.resize = (preprocessing or {}).get("resize")
        self.pairs: List[Dict[str, Any]] = []
        for seq in sorted(p for p in self.root.iterdir() if p.is_dir()):
            if alteration in ("i", "v") and not seq.name.startswith(alteration):
                continue
            ref = seq / "1.ppm"
            if not ref.exists():
                continue
            for i in range(2, 7):
                warped = seq / f"{i}.ppm"
                h_file = seq / f"H_1_{i}"
                if warped.exists() and h_file.exists():
                    self.pairs.append({
                        "name": f"{seq.name}/1_{i}",
                        "ref": ref,
                        "warped": warped,
                        "H": h_file,
                    })

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        import cv2

        rec = self.pairs[idx]
        img = read_gray(rec["ref"], self.resize)
        warped = read_gray(rec["warped"], self.resize)
        H = np.loadtxt(rec["H"]).astype(np.float64).reshape(3, 3)
        if self.resize is not None:
            raw = cv2.imread(str(rec["ref"]), cv2.IMREAD_GRAYSCALE)
            raw_w = cv2.imread(str(rec["warped"]), cv2.IMREAD_GRAYSCALE)
            # H maps ref pixels → warped pixels: rescale each side by its
            # own image's resize ratio
            sy1 = img.shape[0] / raw.shape[0]
            sx1 = img.shape[1] / raw.shape[1]
            sy2 = warped.shape[0] / raw_w.shape[0]
            sx2 = warped.shape[1] / raw_w.shape[1]
            H = np.diag([sx2, sy2, 1.0]) @ H @ np.linalg.inv(np.diag([sx1, sy1, 1.0]))
        return {
            "image": img,
            "warped_image": warped,
            "homography": H,
            "name": rec["name"],
        }
