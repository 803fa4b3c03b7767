"""Shared host-side dataset machinery.

The reference wraps torch ``Dataset`` + multi-worker ``DataLoader``
(``utils/loader.py:20-198``); here augmentation runs on device
(``ssp.data.pipeline``), so the host side only decodes, resizes and
pads — a plain indexable class plus an infinite ``batches`` iterator is
the whole loader.  ``ssp.data.prefetch.Prefetcher`` adds one decode
thread of pipelining.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


def read_gray(path, resize: Optional[Sequence[int]] = None) -> np.ndarray:
    """Grayscale float32 ∈ [0, 1], optionally resized to (H, W) with
    INTER_AREA (the reference's resize mode, ``datasets/Coco.py:158``).

    Decode scaling comes from ``batches(workers=N)`` — both decoders
    release the GIL, so a thread pool is the reference's multi-worker
    DataLoader without multiprocessing.  ``SSP_NATIVE_IO=1`` routes
    JPEG/PNG through the native libjpeg/libpng + C++ area-resize path
    (``ssp/native/imageio.cpp``, parity-tested) — for cv2-free
    deployments; cv2's SIMD libjpeg-turbo is the faster default where
    available (measured 582 vs 416 img/s single-thread on this host).
    """
    import os

    if os.environ.get("SSP_NATIVE_IO", "0") == "1" and str(path).lower().endswith(
        (".jpg", ".jpeg", ".png")
    ):
        from ssp.native import decode_gray_resize

        img = decode_gray_resize(path, resize)
        if img is not None:
            return img
    try:
        import cv2
    except ImportError:  # cv2-free deployment: native decoder only
        from ssp.native import decode_gray_resize

        img = decode_gray_resize(path, resize)
        if img is None:
            raise FileNotFoundError(f"unreadable image: {path}") from None
        return img

    img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(f"unreadable image: {path}")
    if resize is not None:
        h, w = int(resize[0]), int(resize[1])
        img = cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)
    return img.astype(np.float32) / 255.0


class ImageDataset:
    """Indexable sample source with a uniform ``batches`` iterator.

    Subclasses implement ``__len__`` and ``__getitem__`` returning a
    dict of numpy arrays with at least ``image`` [H, W]; ``points`` /
    ``points_valid`` must already be padded to the subclass's fixed K.
    """

    def __len__(self) -> int:  # pragma: no cover - abstract
        raise NotImplementedError

    def __getitem__(self, idx: int) -> Dict[str, Any]:  # pragma: no cover
        raise NotImplementedError

    @staticmethod
    def split_dir(split: str) -> str:
        """Subdirectory predictions/labels for ``split`` live under."""
        return split

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    _BATCH_SKIP = ("name",)  # non-array fields stay off the device path

    def batches(
        self, batch_size: int, shuffle: bool = True, seed: int = 0,
        workers: int = 0,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite iterator of stacked host batches (drops the ragged
        epoch tail so every batch is exactly ``batch_size``).

        ``workers > 0`` decodes the batch's samples on a thread pool —
        cv2 and the native decoder both release the GIL, so this is the
        reference's multi-worker DataLoader without multiprocessing
        (order is preserved: batches are identical for any worker count).
        """
        n = len(self)
        if n == 0:
            raise ValueError(f"{type(self).__name__}: empty dataset")
        rng = np.random.default_rng(seed)
        pool = None
        if workers > 0:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=workers)
        while True:
            order = rng.permutation(n) if shuffle else np.arange(n)
            if n < batch_size:  # tiny corpora: sample with replacement
                order = rng.integers(0, n, batch_size) if shuffle else np.resize(order, batch_size)
            for start in range(0, len(order) - batch_size + 1, batch_size):
                idxs = [int(i) for i in order[start : start + batch_size]]
                if pool is not None:
                    samples = list(pool.map(self.__getitem__, idxs))
                else:
                    samples = [self[i] for i in idxs]
                keys = [k for k in samples[0] if k not in self._BATCH_SKIP]
                yield {k: np.stack([s[k] for s in samples]) for k in keys}

    def images(self) -> Iterator[Tuple[str, np.ndarray]]:
        """(name, image) stream for export pipelines."""
        for i in range(len(self)):
            s = self[i]
            yield s.get("name", str(i)), s["image"]
