"""ctypes bindings for the native C++ image pipeline.

Builds ``libltimage.so`` from ``image_pipeline.cc`` on first use (g++ +
libjpeg, both in the baked toolchain) and exposes:

- :func:`decode_jpeg` — libjpeg decode to a BGR uint8 array (cv2 parity);
- :func:`process_image` — fused zero-pad crop + INTER_AREA/bilinear resize +
  ImageNet normalize;
- :class:`NativeBatchLoader` — thread-pooled decode+process of a whole
  multi-view batch in one call.

Every entry point degrades gracefully: ``available()`` is False when the
library can't be built, and callers fall back to the numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "image_pipeline.cc")
_LIB_PATH = os.path.join(_HERE, "libltimage.so")

_lib = None
_lock = threading.Lock()
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    """Compile the shared library; returns an error string on failure."""
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", _LIB_PATH, "-ljpeg", "-lpthread"]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=120)
    except Exception as e:  # g++ missing etc.
        return str(e)
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            err = _build()
            if err is not None:
                _build_error = err
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            _build_error = str(e)
            return None

        lib.lt_loader_create.restype = ctypes.c_void_p
        lib.lt_loader_create.argtypes = [ctypes.c_int]
        lib.lt_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.lt_decode_jpeg.restype = ctypes.c_int
        lib.lt_decode_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.lt_process_image.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.lt_load_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def decode_jpeg(path: str) -> Optional[np.ndarray]:
    """Decode a JPEG to (H, W, 3) BGR uint8, or None on failure."""
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.lt_decode_jpeg(path.encode(), None, 0, ctypes.byref(h),
                            ctypes.byref(w))
    if rc != 0:
        return None
    buf = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.lt_decode_jpeg(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.size, ctypes.byref(h), ctypes.byref(w))
    return buf if rc == 0 else None


def process_image(image: np.ndarray, bbox, out_shape,
                  normalize: bool = True) -> Optional[np.ndarray]:
    """Fused crop+resize+normalize of an HWC uint8 image."""
    lib = _load()
    if lib is None:
        return None
    image = np.ascontiguousarray(image, np.uint8)
    out = np.empty((out_shape[0], out_shape[1], 3), np.float32)
    left, upper, right, lower = (int(v) for v in bbox)
    lib.lt_process_image(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        image.shape[0], image.shape[1], left, upper, right, lower,
        out_shape[0], out_shape[1], int(normalize),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


class NativeBatchLoader:
    """Thread-pooled JPEG->tensor pipeline for whole multi-view batches."""

    def __init__(self, n_threads: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_build_error}")
        self._lib = lib
        self._handle = lib.lt_loader_create(n_threads)

    def close(self):
        if self._handle:
            self._lib.lt_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def load(self, paths, bboxes, out_shape, normalize: bool = True):
        """Decode + process ``len(paths)`` JPEGs in parallel.

        Returns (batch (N, H, W, 3) float32, ok (N,) bool).
        """
        n = len(paths)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        bboxes = np.ascontiguousarray(bboxes, np.int32)
        out = np.empty((n, out_shape[0], out_shape[1], 3), np.float32)
        ok = np.zeros((n,), np.int32)
        self._lib.lt_load_batch(
            self._handle, arr,
            bboxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n,
            out_shape[0], out_shape[1], int(normalize),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out, ok.astype(bool)
