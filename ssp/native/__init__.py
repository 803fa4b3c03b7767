"""Native (C++) host-side ops with lazy build + pure-python fallback.

Compiled on first use with the system g++ into a cached shared object;
exposed through ctypes.  Every entry point has a numpy fallback so the
package works without a toolchain.  See ``ops.cpp`` for the kernels:
exact greedy NMS (the eval-protocol NMS), bilinear inverse warp, and
two-way NN matching.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import sys
from pathlib import Path
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "ops.cpp"
_IMAGEIO_SRC = Path(__file__).parent / "imageio.cpp"
_BUILD_DIR = Path(__file__).parent / "_build"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_IMAGEIO: Optional[ctypes.CDLL] = None
_IMAGEIO_TRIED = False


def _compile_so(src: Path, name: str, extra: tuple = ()) -> Optional[Path]:
    _BUILD_DIR.mkdir(exist_ok=True)
    so = _BUILD_DIR / name
    if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
        return so
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        str(src), "-o", str(so), *extra,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so
    except Exception as e:  # noqa: BLE001 — fall back to python paths
        log.warning("native build failed (%s); using fallbacks", e)
        return None


def _compile() -> Optional[Path]:
    return _compile_so(_SRC, "libssp_native.so")


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is None and not _TRIED:
        _TRIED = True
        so = _compile()
        if so is not None:
            lib = ctypes.CDLL(str(so))
            i64, f32p = ctypes.c_int64, ctypes.POINTER(ctypes.c_float)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.greedy_nms.restype = i64
            lib.greedy_nms.argtypes = [f32p, i64, i64, i64, ctypes.c_float, u8p]
            lib.inv_warp_bilinear.restype = None
            lib.inv_warp_bilinear.argtypes = [
                f32p, i64, i64, ctypes.POINTER(ctypes.c_double), f32p,
            ]
            lib.nn_match_two_way.restype = None
            lib.nn_match_two_way.argtypes = [
                f32p, i64, f32p, i64, i64,
                ctypes.POINTER(ctypes.c_int32), f32p, u8p,
            ]
            _LIB = lib
    return _LIB


def _imageio_lib() -> Optional[ctypes.CDLL]:
    """libjpeg/libpng decode + INTER_AREA resize (``imageio.cpp``)."""
    global _IMAGEIO, _IMAGEIO_TRIED
    if _IMAGEIO is None and not _IMAGEIO_TRIED:
        _IMAGEIO_TRIED = True
        so = _compile_so(
            _IMAGEIO_SRC, "libssp_imageio.so", ("-ljpeg", "-lpng")
        )
        if so is not None:
            lib = ctypes.CDLL(str(so))
            f32p = ctypes.POINTER(ctypes.c_float)
            i32p = ctypes.POINTER(ctypes.c_int32)
            lib.ssp_decode_gray_resize.restype = ctypes.c_int
            lib.ssp_decode_gray_resize.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, f32p,
            ]
            lib.ssp_image_size.restype = ctypes.c_int
            lib.ssp_image_size.argtypes = [ctypes.c_char_p, i32p, i32p]
            _IMAGEIO = lib
    return _IMAGEIO


def decode_gray_resize(path, resize=None) -> Optional[np.ndarray]:
    """Native JPEG/PNG → grayscale float32 [0, 1], INTER_AREA-resized to
    (H, W) when ``resize`` is given.  Returns None when the native
    library is unavailable or the format unsupported (caller falls back
    to cv2).  The ctypes call releases the GIL for decode+resize, so a
    thread pool scales this across cores (``ssp.data.prefetch``).
    """
    lib = _imageio_lib()
    if lib is None:
        return None
    path_b = str(path).encode()
    if resize is None:
        h, w = ctypes.c_int32(0), ctypes.c_int32(0)
        if lib.ssp_image_size(path_b, ctypes.byref(h), ctypes.byref(w)) != 0:
            return None
        out_h, out_w = h.value, w.value
    else:
        out_h, out_w = int(resize[0]), int(resize[1])
    out = np.empty((out_h, out_w), np.float32)
    rc = lib.ssp_decode_gray_resize(path_b, out_h, out_w, _f32p(out))
    return out if rc == 0 else None


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def greedy_nms(scores: np.ndarray, dist: int, min_score: float = 0.0) -> np.ndarray:
    """Exact greedy grid NMS → boolean keep mask [H, W]."""
    scores = np.ascontiguousarray(scores, np.float32)
    H, W = scores.shape
    lib = _lib()
    if lib is not None:
        keep = np.zeros(H * W, np.uint8)
        lib.greedy_nms(
            _f32p(scores), H, W, dist, ctypes.c_float(min_score),
            keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return keep.reshape(H, W).astype(bool)
    # numpy fallback: same algorithm
    keep = np.zeros((H, W), bool)
    suppressed = np.zeros((H, W), bool)
    order = np.argsort(-scores, axis=None)
    for i in order:
        y, x = divmod(int(i), W)
        s = scores[y, x]
        if s < min_score or s <= 0:
            break
        if suppressed[y, x]:
            continue
        keep[y, x] = True
        suppressed[max(0, y - dist): y + dist + 1, max(0, x - dist): x + dist + 1] = True
    return keep


def inv_warp_bilinear(img: np.ndarray, H_mat: np.ndarray) -> np.ndarray:
    """Host bilinear inverse warp, normalized align-corners coords."""
    img = np.ascontiguousarray(img, np.float32)
    H, W = img.shape
    lib = _lib()
    if lib is not None:
        Hm = np.ascontiguousarray(H_mat, np.float64)
        out = np.zeros_like(img)
        lib.inv_warp_bilinear(
            _f32p(img), H, W,
            Hm.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), _f32p(out),
        )
        return out
    from scipy.ndimage import map_coordinates

    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    nx = xs / ((W - 1) / 2) - 1
    ny = ys / ((H - 1) / 2) - 1
    w = H_mat[2, 0] * nx + H_mat[2, 1] * ny + H_mat[2, 2]
    u = (H_mat[0, 0] * nx + H_mat[0, 1] * ny + H_mat[0, 2]) / w
    v = (H_mat[1, 0] * nx + H_mat[1, 1] * ny + H_mat[1, 2]) / w
    fx = (u + 1) * (W - 1) / 2
    fy = (v + 1) * (H - 1) / 2
    return map_coordinates(img, [fy, fx], order=1, mode="constant").astype(np.float32)


def nn_match_two_way_native(
    desc1: np.ndarray, desc2: np.ndarray, nn_thresh: float
) -> np.ndarray:
    """[N1, D] x [N2, D] unit-norm → matches [3, L] like the python
    matcher (``ssp.postprocess.tracker.nn_match_two_way``)."""
    d1 = np.ascontiguousarray(desc1, np.float32)
    d2 = np.ascontiguousarray(desc2, np.float32)
    n1, D = d1.shape
    n2 = d2.shape[0]
    if n1 == 0 or n2 == 0:
        return np.zeros((3, 0))
    lib = _lib()
    if lib is None:
        from ssp.postprocess.tracker import nn_match_two_way

        return nn_match_two_way(d1.T, d2.T, nn_thresh)
    idx = np.zeros(n1, np.int32)
    dist = np.zeros(n1, np.float32)
    mutual = np.zeros(n1, np.uint8)
    lib.nn_match_two_way(
        _f32p(d1), n1, _f32p(d2), n2, D,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), _f32p(dist),
        mutual.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    keep = (mutual == 1) & (dist < nn_thresh)
    rows = np.flatnonzero(keep)
    return np.stack([rows.astype(float), idx[keep].astype(float), dist[keep]])
