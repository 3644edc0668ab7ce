"""ctypes bindings for the native host-ops library (csrc/hostops.cpp).

Builds ``libhostops.so`` on demand with g++ (cached next to the package)
and exposes NumPy-friendly wrappers. Anything that fails — no compiler,
unusual platform — degrades to ``available() == False`` and callers fall
back to the pure NumPy implementations, so the native path is a pure
accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import typing

import numpy as np

_LIB: typing.Optional[ctypes.CDLL] = None
_TRIED = False


def _source_path() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc", "hostops.cpp")


def _lib_path() -> str:
    cache = os.environ.get(
        "KERAS_OCR_TPU_NATIVE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native"),
    )
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "libhostops.so")


def _build() -> typing.Optional[str]:
    source = _source_path()
    if not os.path.isfile(source):
        return None
    lib = _lib_path()
    if os.path.isfile(lib) and os.path.getmtime(lib) >= os.path.getmtime(source):
        return lib
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", lib, source],
            check=True,
            capture_output=True,
        )
    except (OSError, subprocess.CalledProcessError):
        return None
    return lib


def _load() -> typing.Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    lib_path = _build()
    if lib_path is None:
        return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError:
        return None
    lib.resize_bilinear_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
    ]
    lib.warp_perspective_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_float,
    ]
    lib.label_components_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.label_components_u8.restype = ctypes.c_int
    lib.dilate_square_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _fptr(array: np.ndarray, ctype):
    return array.ctypes.data_as(ctypes.POINTER(ctype))


def resize_bilinear(image: np.ndarray, height: int, width: int) -> np.ndarray:
    """Bilinear resize (HWC or HW float/uint8) via the native kernel."""
    lib = _load()
    assert lib is not None
    squeeze = image.ndim == 2
    src = np.ascontiguousarray(image[..., None] if squeeze else image, dtype=np.float32)
    dst = np.empty((height, width, src.shape[2]), dtype=np.float32)
    lib.resize_bilinear_f32(
        _fptr(src, ctypes.c_float), src.shape[0], src.shape[1], src.shape[2],
        _fptr(dst, ctypes.c_float), height, width,
    )
    if np.issubdtype(image.dtype, np.integer):
        dst = np.clip(np.rint(dst), 0, 255).astype(image.dtype)
    else:
        dst = dst.astype(image.dtype)
    return dst[..., 0] if squeeze else dst


def warp_perspective(image: np.ndarray, M: np.ndarray, dsize, cval=0.0) -> np.ndarray:
    """cv2.warpPerspective analog via the native kernel (M maps src->dst)."""
    lib = _load()
    assert lib is not None
    width, height = dsize
    squeeze = image.ndim == 2
    src = np.ascontiguousarray(image[..., None] if squeeze else image, dtype=np.float32)
    minv = np.ascontiguousarray(np.linalg.inv(np.asarray(M, dtype="float64")))
    dst = np.empty((height, width, src.shape[2]), dtype=np.float32)
    lib.warp_perspective_f32(
        _fptr(src, ctypes.c_float), src.shape[0], src.shape[1], src.shape[2],
        _fptr(minv, ctypes.c_double),
        _fptr(dst, ctypes.c_float), height, width, ctypes.c_float(float(cval)),
    )
    if np.issubdtype(image.dtype, np.integer):
        dst = np.clip(np.rint(dst), np.iinfo(image.dtype).min, np.iinfo(image.dtype).max).astype(image.dtype)
    else:
        dst = dst.astype(image.dtype)
    return dst[..., 0] if squeeze else dst


def label_components(mask: np.ndarray):
    """(labels int32 starting at 1, count) — scipy.ndimage.label-compatible."""
    lib = _load()
    assert lib is not None
    mask_u8 = np.ascontiguousarray(mask, dtype=np.uint8)
    labels = np.empty(mask.shape, dtype=np.int32)
    count = lib.label_components_u8(
        _fptr(mask_u8, ctypes.c_uint8), mask.shape[0], mask.shape[1],
        _fptr(labels, ctypes.c_int32),
    )
    return labels, int(count)


def dilate_square(mask: np.ndarray, niter: int) -> np.ndarray:
    """cv2-anchor square dilation of a boolean mask."""
    lib = _load()
    assert lib is not None
    src = np.ascontiguousarray(mask, dtype=np.uint8)
    dst = np.empty_like(src)
    lib.dilate_square_u8(
        _fptr(src, ctypes.c_uint8), mask.shape[0], mask.shape[1], int(niter),
        _fptr(dst, ctypes.c_uint8),
    )
    return dst.astype(bool)
