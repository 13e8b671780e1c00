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
    lib.yp_warp_perspective_f32.argtypes = [f32p, i32, i32, i32, f32p, f32p, i32]
    if hasattr(lib, "yp_warp_coverage_f32"):  # stale prebuilt .so tolerance
        lib.yp_warp_coverage_f32.argtypes = [i32, i32, f32p, f32p]
    lib.yp_cov_pack_upper.argtypes = [f32p, i32, f32p]
    lib.yp_cov_unpack_upper.argtypes = [f32p, i32, f32p]
    lib.yp_cov_packed_size.argtypes = [i32]
    lib.yp_cov_packed_size.restype = ctypes.c_int64
    _lib = lib
    return lib


def warp_backend() -> str:
    """Which host-warp implementation `warp_perspective_f32` will use:
    'native' (C++ libyp_preprocess) or 'numpy' (slow per-pixel fallback)."""
    return "native" if _load() is not None else "numpy"


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


def warp_perspective_f32(
    img: np.ndarray, hinv: np.ndarray, mode: str = "bilinear"
) -> np.ndarray:
    """Inverse-warp an `(H, W, C)` float32 image by a NORMALIZED-coords
    homography — host twin of `ops.geometry.warp_image` (align_corners,
    zero padding). Requires the native library (auto-built on import)."""
    lib = _load()
    img = np.ascontiguousarray(img, np.float32)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    hinv = np.ascontiguousarray(hinv, np.float32).reshape(9)
    out = np.empty_like(img)
    if lib is None:  # pure-numpy fallback (slow; tests/no-toolchain hosts)
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        xn = -1.0 + 2.0 * xs / max(w - 1, 1)
        yn = -1.0 + 2.0 * ys / max(h - 1, 1)
        H3 = hinv.reshape(3, 3)
        d = H3[2, 0] * xn + H3[2, 1] * yn + H3[2, 2]
        sx = ((H3[0, 0] * xn + H3[0, 1] * yn + H3[0, 2]) / d + 1) * 0.5 * (w - 1)
        sy = ((H3[1, 0] * xn + H3[1, 1] * yn + H3[1, 2]) / d + 1) * 0.5 * (h - 1)
        if mode == "nearest":
            xi = np.floor(sx + 0.5).astype(np.int64)
            yi = np.floor(sy + 0.5).astype(np.int64)
            inside = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
            out = img[np.clip(yi, 0, h - 1), np.clip(xi, 0, w - 1)]
            out[~inside] = 0.0
        else:
            x0 = np.floor(sx); y0 = np.floor(sy)
            wx = (sx - x0)[..., None]; wy = (sy - y0)[..., None]
            out = np.zeros_like(img)
            for dy in (0, 1):
                for dx in (0, 1):
                    xi = x0.astype(np.int64) + dx
                    yi = y0.astype(np.int64) + dy
                    inside = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))[..., None]
                    v = img[np.clip(yi, 0, h - 1), np.clip(xi, 0, w - 1)]
                    wgt = (wx if dx else 1 - wx) * (wy if dy else 1 - wy)
                    out = out + np.where(inside, wgt * v, 0.0)
        return out[..., 0] if squeeze else out.astype(np.float32)
    lib.yp_warp_perspective_f32(
        _f32ptr(img), h, w, c, _f32ptr(hinv), _f32ptr(out),
        1 if mode == "nearest" else 0,
    )
    return out[..., 0] if squeeze else out


def warp_coverage_f32(hw: tuple[int, int], hinv: np.ndarray) -> np.ndarray:
    """Validity coverage of an inverse warp: EXACTLY
    `warp_perspective_f32(ones(hw), hinv, mode="nearest")` but computed as a
    pure bounds test with no source reads (auto-vectorized; ~6x faster) —
    the hot call of the host-warp mask path."""
    H, W = int(hw[0]), int(hw[1])
    hinv = np.ascontiguousarray(hinv, np.float32).reshape(9)
    lib = _load()
    if lib is None or not hasattr(lib, "yp_warp_coverage_f32"):
        return warp_perspective_f32(np.ones((H, W), np.float32), hinv, mode="nearest")
    out = np.empty((H, W), np.float32)
    lib.yp_warp_coverage_f32(H, W, _f32ptr(hinv), _f32ptr(out))
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
