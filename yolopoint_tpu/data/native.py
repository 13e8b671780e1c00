"""ctypes bindings for the native C++ preprocessing library.

Loads `native/libyp_preprocess.so` (built by `make -C native`): bilinear /
area resize, letterbox, u8->f32 normalization, covariance pack/unpack — the
host-side pixel path the reference delegates to OpenCV C++ and Eigen
(SURVEY.md §2.9 items 4 and 6). Falls back to numpy/cv2 implementations when
the library is absent (`available()` reports which path is live).
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional

import numpy as np

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "libyp_preprocess.so"
_lib: Optional[ctypes.CDLL] = None
_build_attempted = False


def _try_build() -> None:
    """Build the library in-tree on first use (fresh checkouts have sources
    but no .so — the Makefile is a single g++ invocation, ~1 s)."""
    global _build_attempted
    if _build_attempted:
        return
    _build_attempted = True
    import shutil
    import subprocess

    if shutil.which("make") is None:
        return
    try:
        subprocess.run(
            ["make", "-C", str(_LIB_PATH.parent)],
            check=True, capture_output=True, timeout=120,
        )
    except Exception:
        pass


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        _try_build()
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32 = ctypes.c_int
    lib.yp_resize_bilinear_u8.argtypes = [u8p, i32, i32, i32, u8p, i32, i32]
    lib.yp_resize_area_u8.argtypes = [u8p, i32, i32, i32, u8p, i32, i32]
    lib.yp_letterbox_u8.argtypes = [
        u8p, i32, i32, i32, u8p, i32, i32, ctypes.c_uint8,
        ctypes.POINTER(i32), ctypes.POINTER(i32), ctypes.POINTER(ctypes.c_float),
    ]
    lib.yp_u8_to_f32.argtypes = [u8p, f32p, ctypes.c_int64]
    lib.yp_cov_pack_upper.argtypes = [f32p, i32, f32p]
    lib.yp_cov_unpack_upper.argtypes = [f32p, i32, f32p]
    lib.yp_cov_packed_size.argtypes = [i32]
    lib.yp_cov_packed_size.restype = ctypes.c_int64
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_u8(img: np.ndarray, dh: int, dw: int, mode: str = "auto") -> np.ndarray:
    """Resize uint8 HWC with the native kernels (area for downscale,
    bilinear for upscale — matching the loader's cv2 interp choice)."""
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    sh, sw, c = img.shape
    if lib is None:
        import cv2

        interp = cv2.INTER_AREA if (mode == "area" or (mode == "auto" and dh < sh)) else cv2.INTER_LINEAR
        out = cv2.resize(img, (dw, dh), interpolation=interp)
        return out[..., None] if out.ndim == 2 else out
    dst = np.empty((dh, dw, c), np.uint8)
    fn = lib.yp_resize_area_u8 if (mode == "area" or (mode == "auto" and dh < sh)) else lib.yp_resize_bilinear_u8
    fn(_u8ptr(img), sh, sw, c, _u8ptr(dst), dh, dw)
    return dst


def letterbox_u8(img: np.ndarray, dh: int, dw: int, pad_value: int = 114):
    """Native letterbox; returns (image, (top, left), ratio)."""
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    sh, sw, c = img.shape
    if lib is None:
        from yolopoint_tpu.data.datasets import letterbox

        out, (r, _), (top, _, left, _) = letterbox(img, (dh, dw))
        return out, (top, left), r
    dst = np.empty((dh, dw, c), np.uint8)
    top = ctypes.c_int()
    left = ctypes.c_int()
    ratio = ctypes.c_float()
    lib.yp_letterbox_u8(
        _u8ptr(img), sh, sw, c, _u8ptr(dst), dh, dw, pad_value,
        ctypes.byref(top), ctypes.byref(left), ctypes.byref(ratio),
    )
    return dst, (top.value, left.value), ratio.value


def u8_to_f32(img: np.ndarray) -> np.ndarray:
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    if lib is None:
        return img.astype(np.float32) / 255.0
    out = np.empty(img.shape, np.float32)
    lib.yp_u8_to_f32(_u8ptr(img), _f32ptr(out), img.size)
    return out


def cov_pack_upper(full: np.ndarray) -> np.ndarray:
    """Symmetric (n, n) -> packed upper triangle (reference covariance_helper
    semantics)."""
    full = np.ascontiguousarray(full, np.float32)
    n = full.shape[0]
    lib = _load()
    if lib is None:
        return full[np.triu_indices(n)].astype(np.float32)
    out = np.empty(n * (n + 1) // 2, np.float32)
    lib.yp_cov_pack_upper(_f32ptr(full), n, _f32ptr(out))
    return out


def cov_unpack_upper(packed: np.ndarray, n: int) -> np.ndarray:
    packed = np.ascontiguousarray(packed, np.float32)
    lib = _load()
    if lib is None:
        full = np.zeros((n, n), np.float32)
        iu = np.triu_indices(n)
        full[iu] = packed
        full[(iu[1], iu[0])] = packed
        return full
    out = np.empty((n, n), np.float32)
    lib.yp_cov_unpack_upper(_f32ptr(packed), n, _f32ptr(out))
    return out
