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
    # always run make: it is incremental (no-op when up to date) and ensures a
    # stale .so never shadows a newer .cpp
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s", "libimageproc.so"],
                       check=True, capture_output=True, timeout=120)
    except Exception:
        if not os.path.exists(_LIB_PATH):
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


_loader_lib = None
_loader_tried = False
_LOADER_PATH = os.path.join(_NATIVE_DIR, "libimageloader.so")


def _load_loader() -> Optional[ctypes.CDLL]:
    global _loader_lib, _loader_tried
    if _loader_lib is not None or _loader_tried:
        return _loader_lib
    _loader_tried = True
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s", "libimageloader.so"],
                       check=True, capture_output=True, timeout=120)
    except Exception:
        if not os.path.exists(_LOADER_PATH):
            return None
    try:
        lib = ctypes.CDLL(_LOADER_PATH)
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.loader_submit.restype = ctypes.c_int
        lib.loader_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_float)]
        lib.loader_wait.restype = ctypes.c_int
        lib.loader_wait.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        _loader_lib = lib
    except OSError:
        _loader_lib = None
    return _loader_lib


class NativeImageLoader:
    """Threaded native image pipeline: libpng/libjpeg decode + the fused
    crop/resize/normalize preprocess on a C++ thread pool (native/loader.cpp).
    submit() returns immediately; get() blocks until that image is ready —
    overlap the next batch's host IO with device compute.  Falls back to
    Python threads + PIL when the native library is unavailable."""

    def __init__(self, size: int, center_crop: bool = True, threads: int = 4,
                 fallback_fn: Optional[Callable] = None,
                 force_fallback: bool = False):
        """force_fallback: use the Python-thread + fallback_fn path even when
        the native library exists — eval uses it when the preprocess is in
        PIL-LANCZOS pixel-parity mode, which the native area-resize does not
        reproduce (the IO/decode still overlaps device compute)."""
        self.size = size
        self._lib = None if force_fallback else _load_loader()
        self._handle = None
        self._pending = {}
        self._next_ticket = 0
        self._pool = None
        if self._lib is not None:
            self._handle = ctypes.c_void_p(self._lib.loader_create(
                threads, size, 1 if center_crop else 0))
        else:
            if fallback_fn is None:
                raise RuntimeError(
                    "NativeImageLoader: native library unavailable "
                    f"({_LOADER_PATH} failed to build/load) and no fallback_fn "
                    "was supplied; pass fallback_fn=preprocess to use the "
                    "Python-thread path")
            import concurrent.futures

            self._pool = concurrent.futures.ThreadPoolExecutor(threads)
            self._fallback = fallback_fn

    @property
    def native(self) -> bool:
        return self._handle is not None

    def submit(self, path: str) -> int:
        if self._handle is not None:
            dst = np.empty((self.size, self.size, 3), np.float32)
            ticket = self._lib.loader_submit(
                self._handle, os.fspath(path).encode(),
                dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            self._pending[ticket] = (dst, path)
            return ticket
        ticket = self._next_ticket
        self._next_ticket += 1
        self._pending[ticket] = (self._pool.submit(self._fallback, path), path)
        return ticket

    def get(self, ticket: int) -> np.ndarray:
        """(1, size, size, 3) float32 [-1, 1]."""
        dst, path = self._pending.pop(ticket)
        if self._handle is not None:
            status = self._lib.loader_wait(self._handle, ticket)
            if status != 1:
                raise IOError(f"native loader failed to decode {path!r}")
            return dst[None]
        out = np.asarray(dst.result(), np.float32)
        return out if out.ndim == 4 else out[None]

    def close(self):
        if self._handle is not None:
            self._lib.loader_destroy(self._handle)
            self._handle = None
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


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
