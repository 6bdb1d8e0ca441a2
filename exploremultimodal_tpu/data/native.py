"""ctypes bindings for the native C++ data-loader core (native/emmloader.cc).

Batch JPEG decode + crop + bilinear two-size resize with a C++ thread pool —
the GIL is released for the whole batch. Falls back gracefully (is_available)
when the shared library hasn't been built; `make -C native` builds it (g++ +
libjpeg, both baked into the image).

The augmentation RNG stays in Python: crop boxes come from
transforms.random_resized_crop_params, so native and PIL paths see the same
crop decisions. Resampling differs (bilinear vs PIL bicubic/lanczos) — the
native path is the throughput option; the PIL path is the reference-parity
option.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
LIB_PATH = os.path.join(NATIVE_DIR, "libemmloader.so")


def build(force: bool = False) -> bool:
    """Compile the shared library (idempotent). Returns success."""
    if os.path.exists(LIB_PATH) and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", NATIVE_DIR, "-s"], check=True, capture_output=True
        )
        return os.path.exists(LIB_PATH)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


@lru_cache(maxsize=1)
def _lib():
    if not os.path.exists(LIB_PATH) and not build():
        return None
    lib = ctypes.CDLL(LIB_PATH)
    lib.emm_decode_resize_batch.restype = ctypes.c_int
    lib.emm_decode_resize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),   # jpeg_data
        ctypes.POINTER(ctypes.c_int64),    # jpeg_sizes
        ctypes.c_int,                      # n
        ctypes.POINTER(ctypes.c_int),      # crop_boxes
        ctypes.POINTER(ctypes.c_uint8),    # out1
        ctypes.c_int,                      # size1
        ctypes.POINTER(ctypes.c_uint8),    # out2 (nullable)
        ctypes.c_int,                      # size2
        ctypes.POINTER(ctypes.c_int),      # status
        ctypes.c_int,                      # num_threads
    ]
    return lib


def is_available() -> bool:
    return _lib() is not None


def decode_resize_batch(
    jpeg_buffers: list[bytes],
    size1: int,
    size2: int | None = None,
    crop_boxes: np.ndarray | None = None,
    num_threads: int = 8,
) -> tuple[np.ndarray, np.ndarray | None, np.ndarray]:
    """Decode N JPEGs, crop, and resize to (size1, size1) [+ (size2, size2)].

    crop_boxes: (N, 4) int32 (left, top, w, h); w<=0 means full image.
    Returns (out1, out2 | None, status) — status[i] != 0 marks a decode
    failure (output zeros; caller resamples, matching base_dataset.py:146-160).
    """
    lib = _lib()
    if lib is None:
        raise RuntimeError("native loader not built; run make -C native")

    n = len(jpeg_buffers)
    keepalive = [ctypes.create_string_buffer(b, len(b)) for b in jpeg_buffers]
    data_ptrs = (ctypes.c_void_p * n)(
        *[ctypes.cast(b, ctypes.c_void_p) for b in keepalive]
    )
    sizes = (ctypes.c_int64 * n)(*[len(b) for b in jpeg_buffers])

    if crop_boxes is None:
        crop_boxes = np.full((n, 4), -1, np.int32)
    boxes = np.ascontiguousarray(crop_boxes, np.int32)

    out1 = np.empty((n, size1, size1, 3), np.uint8)
    out2 = np.empty((n, size2, size2, 3), np.uint8) if size2 else None
    status = np.zeros(n, np.int32)

    lib.emm_decode_resize_batch(
        ctypes.cast(data_ptrs, ctypes.POINTER(ctypes.c_void_p)),
        ctypes.cast(sizes, ctypes.POINTER(ctypes.c_int64)),
        n,
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out1.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        size1,
        out2.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) if out2 is not None
        else ctypes.cast(None, ctypes.POINTER(ctypes.c_uint8)),
        size2 or 0,
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads,
    )
    return out1, out2, status
