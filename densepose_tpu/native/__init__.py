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
            try:
                subprocess.run(
                    [cc, "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", tmp, _SRC, "-lm"],
                    check=True, capture_output=True)
            except subprocess.CalledProcessError:
                # cross/old compilers without -march=native
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
        lib.resample_instance_chw.restype = None
        lib.resample_instance_chw.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ]
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.blend_overlay.restype = None
        lib.blend_overlay.argtypes = [
            u8p, ctypes.c_int, u8p, u8p, u8p, u8p,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.blend_labels_grid.restype = None
        lib.blend_labels_grid.argtypes = [
            u8p, ctypes.c_int, u8p, ctypes.c_int, ctypes.c_int,
            u8p, u8p, ctypes.c_int, ctypes.c_int,
        ]
        fp = ctypes.POINTER(ctypes.c_float)
        lib.resample_blend_chw.restype = None
        lib.resample_blend_chw.argtypes = [
            fp, ctypes.c_int, fp, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, u8p,
        ]
        lib.resample_blend_uv_chw.restype = None
        lib.resample_blend_uv_chw.argtypes = [
            fp, ctypes.c_int, fp, ctypes.c_int, fp,
            ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, u8p,
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


def resample_instance_native_chw(
    coarse: np.ndarray, fine: np.ndarray,
    u: Optional[np.ndarray], v: Optional[np.ndarray],
    out_h: int, out_w: int, need_uv: bool = True,
) -> Optional[Tuple[np.ndarray, Optional[np.ndarray]]]:
    """CHW edition: all inputs (C, H, W) float32 — the predictor's NCHW
    output sliced per instance, so no transpose/copy is needed. With
    ``need_uv=False`` the U/V gather is skipped and uv comes back None
    (the fine-segm overlay consumes labels only). Returns None when the
    native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    coarse = np.ascontiguousarray(coarse, dtype=np.float32)
    fine = np.ascontiguousarray(fine, dtype=np.float32)
    kc, in_h, in_w = coarse.shape
    kf = fine.shape[0]
    labels = np.empty((out_h, out_w), dtype=np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    if need_uv:
        u = np.ascontiguousarray(u, dtype=np.float32)
        v = np.ascontiguousarray(v, dtype=np.float32)
        uv = np.empty((2, out_h, out_w), dtype=np.float32)
        u_p, v_p, uv_p = (u.ctypes.data_as(fp), v.ctypes.data_as(fp),
                          uv.ctypes.data_as(fp))
    else:
        uv = None
        u_p = v_p = uv_p = None
    lib.resample_instance_chw(
        coarse.ctypes.data_as(fp), kc,
        fine.ctypes.data_as(fp), kf,
        u_p, v_p,
        in_h, in_w, out_h, out_w, int(need_uv),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        uv_p,
    )
    return labels.astype(np.int64), uv


def blend_labels_grid_native(
    roi: np.ndarray, grid: np.ndarray,
    cmap_bgr: np.ndarray, blend_lut: np.ndarray,
) -> bool:
    """Fused device-postprocess fine-segm overlay for one instance:
    nearest-resample the (gh, gw) uint8 label grid to the ROI size,
    colormap, and alpha-blend, in place — byte-identical to the unfused
    grid-paste + ``blend_overlay`` chain. ``roi`` is a (h, w, 3) uint8 VIEW
    into the full image. Returns False (caller falls back) when the native
    lib is unavailable or the layout is unsupported."""
    lib = get_lib()
    if lib is None:
        return False
    if (roi.ndim != 3 or roi.shape[2] != 3 or roi.dtype != np.uint8
            or roi.strides[2] != 1 or roi.strides[1] != 3
            or roi.shape[1] > 4096):
        return False
    grid = np.ascontiguousarray(grid, dtype=np.uint8)
    gh, gw = grid.shape
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.blend_labels_grid(
        roi.ctypes.data_as(u8p), roi.strides[0],
        grid.ctypes.data_as(u8p), gh, gw,
        cmap_bgr.ctypes.data_as(u8p), blend_lut.ctypes.data_as(u8p),
        roi.shape[0], roi.shape[1],
    )
    return True


def resample_blend_chw_native(
    coarse: np.ndarray, fine: np.ndarray, roi: np.ndarray,
    cmap_bgr: np.ndarray, blend_lut: np.ndarray,
) -> bool:
    """Fused raw-maps fine-segm overlay for one instance: bilinear-resample
    + argmax the (C, H, W) coarse/fine logit planes to the ROI size and
    alpha-blend the colormapped label in place — byte-identical to
    ``resample_instance_chw`` + ``blend_overlay`` (same C sample/argmax and
    blend code) with no label/mask/matrix intermediates. Returns False when
    the native lib is unavailable or the ROI layout is unsupported."""
    lib = get_lib()
    if lib is None:
        return False
    if (roi.ndim != 3 or roi.shape[2] != 3 or roi.dtype != np.uint8
            or roi.strides[2] != 1 or roi.strides[1] != 3):
        return False
    coarse = np.ascontiguousarray(coarse, dtype=np.float32)
    fine = np.ascontiguousarray(fine, dtype=np.float32)
    kc, in_h, in_w = coarse.shape
    kf = fine.shape[0]
    fp = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.resample_blend_chw(
        coarse.ctypes.data_as(fp), kc,
        fine.ctypes.data_as(fp), kf,
        in_h, in_w,
        roi.ctypes.data_as(u8p), roi.strides[0],
        roi.shape[0], roi.shape[1],
        cmap_bgr.ctypes.data_as(u8p), blend_lut.ctypes.data_as(u8p),
    )
    return True


def resample_blend_uv_chw_native(
    coarse: np.ndarray, fine: np.ndarray, uv_plane: np.ndarray,
    roi: np.ndarray, cmap_bgr: np.ndarray, blend_lut: np.ndarray,
) -> bool:
    """Fused raw-maps U/V overlay for one instance: label argmax as
    ``resample_blend_chw``, then sample only the requested (kf, H, W) U-or-V
    plane at the winning label, map through clip(val*255) truncation, and
    blend in place. Byte-identical to the unfused chain (same C sample code;
    numpy's ``clip(uv*255).astype(uint8)`` reproduced exactly)."""
    lib = get_lib()
    if lib is None:
        return False
    if (roi.ndim != 3 or roi.shape[2] != 3 or roi.dtype != np.uint8
            or roi.strides[2] != 1 or roi.strides[1] != 3):
        return False
    coarse = np.ascontiguousarray(coarse, dtype=np.float32)
    fine = np.ascontiguousarray(fine, dtype=np.float32)
    uv_plane = np.ascontiguousarray(uv_plane, dtype=np.float32)
    kc, in_h, in_w = coarse.shape
    kf = fine.shape[0]
    fp = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.resample_blend_uv_chw(
        coarse.ctypes.data_as(fp), kc,
        fine.ctypes.data_as(fp), kf,
        uv_plane.ctypes.data_as(fp),
        in_h, in_w,
        roi.ctypes.data_as(u8p), roi.strides[0],
        roi.shape[0], roi.shape[1],
        cmap_bgr.ctypes.data_as(u8p), blend_lut.ctypes.data_as(u8p),
    )
    return True


def blend_overlay_native(
    roi: np.ndarray, matrix: np.ndarray, mask: np.ndarray,
    cmap_bgr: np.ndarray, blend_lut: np.ndarray,
) -> bool:
    """In-place colormap+mask+alpha-blend of one box. ``roi`` is a (h, w, 3)
    uint8 VIEW into the full image (any row stride, pixels contiguous);
    matrix/mask are (h, w) uint8; cmap_bgr (256, 3); blend_lut (256, 256)
    with blend_lut[r, v] = blended byte. Returns False (caller falls back)
    when the native lib is unavailable or the view layout is unsupported."""
    lib = get_lib()
    if lib is None:
        return False
    h, w = matrix.shape
    if (roi.shape != (h, w, 3) or roi.dtype != np.uint8
            or roi.strides[2] != 1 or roi.strides[1] != 3):
        return False
    matrix = np.ascontiguousarray(matrix, dtype=np.uint8)
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.blend_overlay(
        roi.ctypes.data_as(u8p), roi.strides[0],
        matrix.ctypes.data_as(u8p), mask.ctypes.data_as(u8p),
        cmap_bgr.ctypes.data_as(u8p), blend_lut.ctypes.data_as(u8p),
        h, w,
    )
    return True
