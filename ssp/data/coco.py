"""COCO readers: images + HA pseudo-labels (+ panoptic semantics).

Reference: ``datasets/Coco.py`` (image/label join, INTER_AREA resize,
/255) and ``datasets/Coco_sem.py`` (panoptic png semantic labels mapped
through the 133-class table).  Host side only: decode, resize, pad;
augmentation and label splatting happen on device in
``ssp.data.pipeline.prepare_batch``.

Label coordinates: HA-export npz ``pts`` are (x, y, conf) in the export
resolution, which the reference (and the shipped configs) keep equal to
the training resolution — points are used as stored, not rescaled.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from ssp.data.base import ImageDataset, read_gray
from ssp.data.coco_labels import IGNORE_CLASS, load_panoptic_mapping
from ssp.registry import register
from ssp.utils.experiment import settings_paths

log = logging.getLogger(__name__)

IMAGE_EXTS = (".jpg", ".jpeg", ".png")


@register("dataset", "Coco")
class CocoDataset(ImageDataset):
    def __init__(
        self,
        task: str = "train",
        root: Optional[Path] = None,
        labels: Optional[Path] = None,
        preprocessing: Optional[Dict[str, Any]] = None,
        max_points: int = 1000,
        **_unused: Any,
    ):
        self.task = task
        self.root = Path(root) if root else settings_paths()["DATA_PATH"] / "COCO"
        self.resize = (preprocessing or {}).get("resize")
        self.max_points = int(max_points)

        img_dir = self.root / self.split_dir(task)
        self.files = sorted(
            p for p in img_dir.iterdir() if p.suffix.lower() in IMAGE_EXTS
        ) if img_dir.is_dir() else []
        self.labels_dir: Optional[Path] = None
        if labels:
            # label join: keep only images that have a pseudo-label file
            # (reference datasets/Coco.py:96-117)
            self.labels_dir = Path(labels) / self.split_dir(task)
            before = len(self.files)
            self.files = [
                f for f in self.files if (self.labels_dir / f"{f.stem}.npz").exists()
            ]
            if len(self.files) < before:
                log.info(
                    "label join dropped %d/%d unlabeled images",
                    before - len(self.files), before,
                )

    @staticmethod
    def split_dir(split: str) -> str:
        return "train2017" if split.startswith("train") else "val2017"

    def __len__(self) -> int:
        return len(self.files)

    def _load_points(self, stem: str):
        points = np.zeros((self.max_points, 2), np.float32)
        valid = np.zeros((self.max_points,), bool)
        if self.labels_dir is not None:
            with np.load(self.labels_dir / f"{stem}.npz") as z:
                arr = z["pts"]  # bind once: NpzFile decompresses per access
                pts = np.asarray(arr, np.float32).reshape(-1, arr.shape[-1])
            k = min(len(pts), self.max_points)
            points[:k] = pts[:k, :2]
            valid[:k] = True
        return points, valid

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        path = self.files[idx]
        points, valid = self._load_points(path.stem)
        return {
            "image": read_gray(path, self.resize),
            "points": points,
            "points_valid": valid,
            "name": path.stem,
        }


@register("dataset", "Coco_sem")
class CocoSemDataset(CocoDataset):
    """COCO with per-pixel panoptic train ids in ``sem``.

    Raw category ids come from ``<sem_labels>/semantic_<split>/<id>.png``
    and are mapped through the 133-class table — the built-in one
    (``ssp.data.coco_labels``) unless a panoptic categories json is
    found next to the pngs, so raw ids can never leak into the 133-way
    CE (reference ships the table in ``utils/coco_labels.py:1-160``).
    """

    def __init__(
        self,
        task: str = "train",
        sem_labels: Optional[Path] = None,
        **kwargs: Any,
    ):
        super().__init__(task=task, **kwargs)
        base = Path(sem_labels) if sem_labels else (
            settings_paths()["DATA_PATH"] / "COCO" / "annotations"
        )
        self.sem_dir = base / f"semantic_{self.split_dir(task)}"
        json_candidates = sorted(base.glob("panoptic_*.json"))
        self.mapping = load_panoptic_mapping(
            json_candidates[0] if json_candidates else None
        )
        missing = [
            f.stem for f in self.files if not (self.sem_dir / f"{f.stem}.png").exists()
        ]
        if missing:
            raise FileNotFoundError(
                f"{len(missing)} images lack semantic labels under "
                f"{self.sem_dir} (first: {missing[0]})"
            )

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        import cv2

        sample = super().__getitem__(idx)
        raw = cv2.imread(
            str(self.sem_dir / f"{sample['name']}.png"), cv2.IMREAD_GRAYSCALE
        )
        if raw is None:
            raise FileNotFoundError(self.sem_dir / f"{sample['name']}.png")
        if self.resize is not None:
            h, w = int(self.resize[0]), int(self.resize[1])
            raw = cv2.resize(raw, (w, h), interpolation=cv2.INTER_NEAREST)
        sem = self.mapping[np.clip(raw.astype(np.int64), 0, len(self.mapping) - 1)]
        if sem.max() > IGNORE_CLASS:
            raise ValueError(
                f"unmapped semantic ids in {sample['name']}: max {sem.max()}"
            )
        sample["sem"] = sem.astype(np.int32)
        return sample
