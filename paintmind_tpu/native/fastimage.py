"""ctypes bindings for the native fastimage library (see fastimage.cpp).

Builds ``libfastimage.so`` with make on first use (graceful fallback when
the toolchain/libjpeg is missing — callers check ``is_available()``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, 'libfastimage.so')
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH)
                    < os.path.getmtime(os.path.join(_DIR, 'fastimage.cpp'))):
                subprocess.run(['make', '-s'], cwd=_DIR, check=True,
                               capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.pm_batch_decode_preprocess.restype = ctypes.c_int
            lib.pm_batch_preprocess_rgb.restype = ctypes.c_int
            lib.pm_jpeg_shape.restype = ctypes.c_int
            _lib = lib
        except Exception as e:  # missing toolchain / libjpeg
            print(f'fastimage: native build unavailable ({e}); '
                  'falling back to PIL')
            _lib = None
        return _lib


def is_available():
    return _load() is not None


def _crop_params(n, resize, crop, is_train, hflip, rng):
    rng = rng or np.random.default_rng()
    max_off = resize - crop
    if is_train:
        tops = rng.integers(0, max_off + 1, n).astype(np.int32)
        lefts = rng.integers(0, max_off + 1, n).astype(np.int32)
        flips = ((rng.random(n) < 0.5) & hflip).astype(np.uint8)
    else:
        tops = np.full(n, max_off // 2, np.int32)
        lefts = np.full(n, max_off // 2, np.int32)
        flips = np.zeros(n, np.uint8)
    return tops, lefts, flips


def batch_decode_preprocess(jpeg_buffers, img_size=256, scale=0.8,
                            is_train=True, hflip=True, rng=None,
                            num_threads=None):
    """list of JPEG bytes → (N, img_size, img_size, 3) float32 in [-1, 1].
    Native equivalent of stage1_transform/stage2_transform applied to a
    batch.  Returns (batch, n_failed)."""
    lib = _load()
    if lib is None:
        raise RuntimeError('native fastimage not available')
    n = len(jpeg_buffers)
    resize = int(img_size / scale)
    tops, lefts, flips = _crop_params(n, resize, img_size, is_train, hflip, rng)

    bufs = [np.frombuffer(b, np.uint8) for b in jpeg_buffers]
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for b in bufs])
    lens = (ctypes.c_size_t * n)(*[b.size for b in bufs])
    out = np.empty((n, img_size, img_size, 3), np.float32)
    failed = lib.pm_batch_decode_preprocess(
        ptrs, lens, n, resize, img_size,
        tops.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        lefts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        flips.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads or os.cpu_count() or 1)
    return out, failed


def batch_preprocess_rgb(images, img_size=256, scale=0.8, is_train=True,
                         hflip=True, rng=None, num_threads=None):
    """list of HWC uint8 arrays → (N, img_size, img_size, 3) float32."""
    lib = _load()
    if lib is None:
        raise RuntimeError('native fastimage not available')
    n = len(images)
    resize = int(img_size / scale)
    tops, lefts, flips = _crop_params(n, resize, img_size, is_train, hflip, rng)
    images = [np.ascontiguousarray(im, np.uint8) for im in images]
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[im.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for im in images])
    hs = (ctypes.c_int * n)(*[im.shape[0] for im in images])
    ws = (ctypes.c_int * n)(*[im.shape[1] for im in images])
    out = np.empty((n, img_size, img_size, 3), np.float32)
    lib.pm_batch_preprocess_rgb(
        ptrs, hs, ws, n, resize, img_size,
        tops.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        lefts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        flips.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads or os.cpu_count() or 1)
    return out
