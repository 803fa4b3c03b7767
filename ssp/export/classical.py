"""Classical detector/descriptor baselines (SIFT / ORB).

Reference: ``models/classical_detectors_descriptors.py:8-66`` +
``export_classical.py`` — OpenCV feature extraction exported in the
same npz pair format as the learned models so ``evaluation.py``
compares them directly.  Host-side by nature (OpenCV C++).
"""

from __future__ import annotations

from typing import Tuple

import cv2
import numpy as np


def classical_detect_describe(
    img: np.ndarray, method: str = "sift", top_k: int = 1000
) -> Tuple[np.ndarray, np.ndarray]:
    """img: [H, W] float in [0, 1] → (pts [N, 3] (x, y, response),
    desc [N, D])."""
    img_u8 = (img * 255).astype(np.uint8)
    if method == "sift":
        feat = cv2.SIFT_create(nfeatures=top_k)
    elif method == "orb":
        feat = cv2.ORB_create(nfeatures=top_k)
    else:
        raise ValueError(f"unknown classical method {method!r}")
    kps, desc = feat.detectAndCompute(img_u8, None)
    if not kps:
        d_dim = 128 if method == "sift" else 32
        return np.zeros((0, 3)), np.zeros((0, d_dim))
    pts = np.array([[k.pt[0], k.pt[1], k.response] for k in kps])
    order = np.argsort(-pts[:, 2])[:top_k]
    return pts[order], desc[order]


def match_classical(
    desc1: np.ndarray, desc2: np.ndarray, method: str = "sift"
) -> np.ndarray:
    """Cross-checked BFMatcher; Hamming for ORB, L2 for SIFT
    (``descriptor_evaluation.py:88-98``)."""
    norm = cv2.NORM_HAMMING if method == "orb" else cv2.NORM_L2
    bf = cv2.BFMatcher(norm, crossCheck=True)
    matches = bf.match(desc1, desc2)
    return np.array([[m.queryIdx, m.trainIdx, m.distance] for m in matches]).reshape(-1, 3)
