"""ctypes bindings for the native host-side image pipeline (native/imageproc.cpp).

Builds the shared library on first use if it isn't present (g++ is in the
image); every entry point has a pure-numpy fallback so the package works
without a toolchain.  A worker-thread prefetcher overlaps host preprocessing
with device compute during eval sweeps.
"""

from __future__ import annotations

import ctypes
import os
import queue
import subprocess
import threading
from typing import Callable, Iterable, Iterator, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libimageproc.so")
_lib = None
_lib_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.preprocess_image.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
        lib.postprocess_image.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.decode_rle_mask.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def preprocess_image(img: np.ndarray, size: int, center_crop: bool = True
                     ) -> Optional[np.ndarray]:
    """uint8 HWC -> (1, size, size, 3) float32 [-1,1]; None if native lib
    unavailable (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    out = np.empty((size, size, 3), dtype=np.float32)
    lib.preprocess_image(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), size,
        1 if center_crop else 0)
    return out[None]


def postprocess_image(img: np.ndarray) -> Optional[np.ndarray]:
    """float32 HWC [-1,1] -> uint8 HWC; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.float32)
    out = np.empty(img.shape, dtype=np.uint8)
    lib.postprocess_image(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), img.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def decode_rle_mask(encoded, shape=(512, 512)) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    enc = np.ascontiguousarray(np.asarray(encoded, dtype=np.int64))
    out = np.empty(shape, dtype=np.float32)
    lib.decode_rle_mask(
        enc.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(enc) // 2,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), shape[0], shape[1])
    return out


class Prefetcher:
    """Worker-thread pipeline: overlap host-side sample loading/preprocessing
    with device compute (the reference loads synchronously per sample,
    eval.py:84-100)."""

    _SENTINEL = object()

    def __init__(self, fn: Callable, items: Iterable, depth: int = 2):
        self.fn = fn
        self.items = list(items)
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        for item in self.items:
            try:
                self.q.put((item, self.fn(item), None))
            except Exception as e:  # surfaced at consumption point
                self.q.put((item, None, e))
        self.q.put(self._SENTINEL)

    def __iter__(self) -> Iterator:
        while True:
            got = self.q.get()
            if got is self._SENTINEL:
                return
            item, value, err = got
            if err is not None:
                raise err
            yield item, value
