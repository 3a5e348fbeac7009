"""Native (C) host-side runtime pieces, loaded via ctypes.

The TPU compute path is JAX/XLA/Pallas; this package covers the host side of
the pipeline where the reference leaned on torch's C++ ops — currently the
per-instance DensePose result extraction (fastvis.c), which replaces four
full-map interpolations + a 24-way python gather loop with one fused pass.

The shared object is built on first use with the system compiler into the
user cache; import degrades gracefully to the numpy implementation when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fastvis.c")
_CACHE = os.path.expanduser(
    os.environ.get("DENSEPOSE_TPU_CACHE", "~/.cache/densepose_tpu"))

_lib = None
_tried = False
_build_lock = threading.Lock()  # extractor threads race the first build


def _build() -> Optional[ctypes.CDLL]:
    so_path = os.path.join(_CACHE, "fastvis.so")
    try:
        if (not os.path.exists(so_path)
                or os.path.getmtime(so_path) < os.path.getmtime(_SRC)):
            os.makedirs(_CACHE, exist_ok=True)
            cc = os.environ.get("CC", "cc")
            # per-pid tmp name: concurrent processes never write the same file
            tmp = f"{so_path}.{os.getpid()}.tmp"
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", tmp, _SRC, "-lm"],
                check=True, capture_output=True)
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        lib.resample_instance.restype = None
        lib.resample_instance.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ]
        return lib
    except Exception as e:  # no compiler / sandboxed FS: numpy fallback
        logger.info("native fastvis unavailable (%s); using numpy fallback", e)
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if not _tried:
        with _build_lock:
            if not _tried:
                _lib = _build()
                _tried = True
    return _lib


def resample_instance_native(
    coarse: np.ndarray, fine: np.ndarray, u: np.ndarray, v: np.ndarray,
    out_h: int, out_w: int,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """All inputs (H, W, C) float32 for one instance. Returns
    (labels (h, w) int64, uv (2, h, w) float32), or None if the native lib is
    unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    coarse = np.ascontiguousarray(coarse, dtype=np.float32)
    fine = np.ascontiguousarray(fine, dtype=np.float32)
    u = np.ascontiguousarray(u, dtype=np.float32)
    v = np.ascontiguousarray(v, dtype=np.float32)
    in_h, in_w, kc = coarse.shape
    kf = fine.shape[2]
    labels = np.empty((out_h, out_w), dtype=np.int32)
    uv = np.empty((2, out_h, out_w), dtype=np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.resample_instance(
        coarse.ctypes.data_as(fp), kc,
        fine.ctypes.data_as(fp), kf,
        u.ctypes.data_as(fp), v.ctypes.data_as(fp),
        in_h, in_w, out_h, out_w,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        uv.ctypes.data_as(fp),
    )
    return labels.astype(np.int64), uv
