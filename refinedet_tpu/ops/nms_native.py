"""ctypes bindings + dispatcher for the native host NMS library.

Counterpart of the reference's ``utils/nms_wrapper.py:23-31`` (dispatch to
cpu_nms / gpu_nms) and its distutils build (``utils/build.py``): here the
native code is plain C++ (native/nms.cpp) built by ``native/build.sh``; this
module auto-builds it on first use if a compiler is available, and falls
back to the pure-numpy oracle implementation otherwise. The accelerator
path is the Pallas/XLA kernel — this is the host-only fallback the
reference used its Cython module for.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Optional

import numpy as np

_LIB_PATH = osp.join(osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))), "native", "libnms.so")
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    src = osp.join(osp.dirname(_LIB_PATH), "nms.cpp")
    stale = (not osp.exists(_LIB_PATH)
             or (osp.exists(src)
                 and osp.getmtime(src) > osp.getmtime(_LIB_PATH)))
    if stale:
        # (Re)build when missing OR older than the source — a stale .so
        # would silently run the old kernel. The binary is a local,
        # uncommitted artifact (build.sh uses -march=native).
        build = osp.join(osp.dirname(_LIB_PATH), "build.sh")
        try:
            subprocess.run(["bash", build], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            if not osp.exists(_LIB_PATH):
                return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.nms_hard.restype = ctypes.c_int
        lib.nms_hard.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        lib.nms_soft.restype = ctypes.c_int
        lib.nms_soft.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def _numpy_nms(dets: np.ndarray, thresh: float, plus_one: bool):
    """Pure-numpy greedy NMS fallback (py_cpu_nms.py semantics)."""
    off = 1.0 if plus_one else 0.0
    x1, y1, x2, y2, sc = (dets[:, i] for i in range(5))
    areas = (x2 - x1 + off) * (y2 - y1 + off)
    order = np.argsort(-sc, kind="stable")
    keep = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        rest = order[1:]
        iw = np.maximum(
            0.0, np.minimum(x2[i], x2[rest]) -
            np.maximum(x1[i], x1[rest]) + off)
        ih = np.maximum(
            0.0, np.minimum(y2[i], y2[rest]) -
            np.maximum(y1[i], y1[rest]) + off)
        inter = iw * ih
        iou = inter / (areas[i] + areas[rest] - inter)
        order = rest[iou <= thresh]
    return keep


def nms(dets: np.ndarray, thresh: float, force_cpu: bool = True,
        plus_one: bool = True) -> list:
    """Greedy hard NMS over [N, 5] (x1, y1, x2, y2, score) rows.

    Signature mirrors nms_wrapper.nms; ``force_cpu`` is accepted for API
    parity (the host path is always CPU here — accelerator NMS lives in
    ops/nms.py / ops/nms_pallas.py). Returns kept indices,
    score-descending.
    """
    del force_cpu
    dets = np.ascontiguousarray(dets, np.float32)
    if dets.shape[0] == 0:
        return []
    lib = _load_lib()
    if lib is None:
        return _numpy_nms(dets, thresh, plus_one)
    keep = np.empty(dets.shape[0], np.int32)
    count = lib.nms_hard(
        dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dets.shape[0], ctypes.c_float(thresh), int(plus_one),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return keep[:count].tolist()


def soft_nms(dets: np.ndarray, iou_thresh: float = 0.3, sigma: float = 0.5,
             score_thresh: float = 0.001, method: str = "linear") -> list:
    """Soft-NMS (cpu_nms.pyx:70-163 semantics). Rescores ``dets`` in place
    and returns surviving indices."""
    caller_dets = dets
    dets = np.ascontiguousarray(dets, np.float32)
    if dets.shape[0] == 0:
        return []
    m = {"hard": 0, "linear": 1, "gaussian": 2}[method]
    lib = _load_lib()
    if lib is None:
        raise RuntimeError(
            "native NMS library unavailable; soft_nms has no numpy "
            "fallback (use refinedet_tpu.ops.soft_nms on device)")
    keep = np.empty(dets.shape[0], np.int32)
    count = lib.nms_soft(
        dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dets.shape[0], ctypes.c_float(iou_thresh), ctypes.c_float(sigma),
        ctypes.c_float(score_thresh), m,
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if caller_dets is not dets:
        # ascontiguousarray copied (non-contiguous or non-f32 input):
        # write the rescored/reordered rows back so the documented
        # in-place semantics hold for any input dtype/layout.
        caller_dets[...] = dets
    return keep[:count].tolist()
