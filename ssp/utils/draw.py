"""Visualization helpers (host-side, cv2/matplotlib).

Capability parity with ``utils/draw.py``: image grids, keypoint
overlays, match drawings, channel-overlap composites — plus track
drawing for the PointTracker (``models/model_wrap.py:617-649``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import cv2
import numpy as np


def to_u8(img: np.ndarray) -> np.ndarray:
    if img.dtype == np.uint8:
        return img
    return np.clip(img * 255.0, 0, 255).astype(np.uint8)


def img_overlap(img_r: np.ndarray, img_g: np.ndarray, img_gray: np.ndarray) -> np.ndarray:
    """Red/green channel overlay on a gray base (reference semantics)."""
    base = np.stack([img_gray] * 3, axis=-1).astype(np.float32)
    base[..., 0] += img_r
    base[..., 1] += img_g
    return np.clip(base, 0.0, 1.0)


def draw_keypoints(
    img: np.ndarray, pts: np.ndarray, radius: int = 3,
    color=(0, 255, 0), scale: int = 1,
) -> np.ndarray:
    """pts: [N, ≥2] (x, y).  Returns a BGR uint8 image (optionally
    upscaled by ``scale`` like the reference's s=3 rendering)."""
    out = cv2.cvtColor(to_u8(img), cv2.COLOR_GRAY2BGR)
    if scale != 1:
        out = cv2.resize(out, None, fx=scale, fy=scale, interpolation=cv2.INTER_NEAREST)
    for x, y in np.asarray(pts)[:, :2]:
        cv2.circle(out, (int(round(x * scale)), int(round(y * scale))), radius, color, -1)
    return out


def draw_matches(
    img1: np.ndarray, pts1: np.ndarray, img2: np.ndarray, pts2: np.ndarray,
    matches: np.ndarray, max_draw: int = 200,
) -> np.ndarray:
    """matches: [L, 4] (x1, y1, x2, y2) — side-by-side match lines."""
    a = cv2.cvtColor(to_u8(img1), cv2.COLOR_GRAY2BGR)
    b = cv2.cvtColor(to_u8(img2), cv2.COLOR_GRAY2BGR)
    H = max(a.shape[0], b.shape[0])
    canvas = np.zeros((H, a.shape[1] + b.shape[1], 3), np.uint8)
    canvas[: a.shape[0], : a.shape[1]] = a
    canvas[: b.shape[0], a.shape[1]:] = b
    off = a.shape[1]
    rng = np.random.default_rng(0)
    for x1, y1, x2, y2 in np.asarray(matches)[:max_draw]:
        color = tuple(int(c) for c in rng.integers(64, 255, 3))
        cv2.line(canvas, (int(x1), int(y1)), (int(x2) + off, int(y2)), color, 1, cv2.LINE_AA)
    return canvas


def plot_imgs(
    imgs: Sequence[np.ndarray], titles: Optional[List[str]] = None,
    path: Optional[str] = None, cmap: str = "gray",
):
    """Grid plot; saves to ``path`` when given (headless-safe)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(imgs)
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 4))
    if n == 1:
        axes = [axes]
    titles = list(titles or [])
    titles += [""] * (n - len(titles))  # zip would silently drop images
    for ax, img, title in zip(axes, imgs, titles):
        ax.imshow(img, cmap=cmap)
        ax.set_title(title)
        ax.axis("off")
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig


def draw_tracks(out: np.ndarray, tracker, min_length: int = 2) -> np.ndarray:
    """Overlay surviving tracks on a BGR image using the tracker's
    stored per-frame points (reference ``draw_tracks``)."""
    tracks = tracker.get_tracks(min_length)
    offsets = np.cumsum([0] + [p.shape[1] for p in tracker.all_pts[:-1]])
    for track in tracks:
        for i in range(tracker.maxl - 1):
            id1, id2 = int(track[i + 2]), int(track[i + 3])
            if id1 < 0 or id2 < 0:
                continue
            p1 = tracker.all_pts[i][:2, id1 - int(offsets[i])]
            p2 = tracker.all_pts[i + 1][:2, id2 - int(offsets[i + 1])]
            cv2.line(
                out,
                (int(round(p1[0])), int(round(p1[1]))),
                (int(round(p2[0])), int(round(p2[1]))),
                (0, 255, 0), 1, cv2.LINE_AA,
            )
            cv2.circle(out, (int(round(p2[0])), int(round(p2[1]))), 2, (255, 0, 0), -1)
    return out
