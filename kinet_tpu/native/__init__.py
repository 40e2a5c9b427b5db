"""ctypes bindings for the native host-side runtime kernels.

Auto-builds `libkinet_io.so` on first import (make, ~1s) and falls back to
pure-python implementations when a compiler is unavailable. API:

- parse_mot_csv(path) -> float32 [N, 7] rows (frame, id, x, y, w, h, conf)
- normalize_pad_image(uint8 HWC, ph, pw) -> (float32 [ph, pw, 3], bool mask)
- greedy_nms(boxes, scores, thr) -> int64 keep indices
"""
from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess

import numpy as np

_DIR = osp.dirname(osp.abspath(__file__))
_LIB_PATH = osp.join(_DIR, "libkinet_io.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not osp.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
        osp.join(_DIR, "kinet_io.cpp")
    ):
        try:
            subprocess.run(
                ["make", "-C", _DIR, "libkinet_io.so"],
                check=True, capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _lib = False
        return _lib
    lib.parse_mot_csv.restype = ctypes.c_int64
    lib.parse_mot_csv.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
    ]
    lib.normalize_pad_image.restype = None
    lib.normalize_pad_image.argtypes = [
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
    ]
    lib.greedy_nms.restype = ctypes.c_int64
    lib.greedy_nms.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_float,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return bool(_load())


def parse_mot_csv(path: str, max_rows: int = 1 << 20) -> np.ndarray:
    lib = _load()
    if not lib:
        rows = []
        import csv

        with open(path) as f:
            for row in csv.reader(f):
                if len(row) >= 6:
                    vals = [float(v) for v in row[:6]]
                    conf = float(row[6]) if len(row) > 6 else 1.0
                    rows.append(vals + [conf])
        return np.asarray(rows, np.float32).reshape(-1, 7)
    out = np.empty((max_rows, 7), np.float32)
    n = lib.parse_mot_csv(path.encode(), out, max_rows)
    if n < 0:
        raise IOError(path)
    return out[:n].copy()


def normalize_pad_image(img: np.ndarray, ph: int, pw: int):
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    lib = _load()
    if not lib:
        from ..structs import pad_image_to
        from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD

        x = img.astype(np.float32) / 255.0
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        return pad_image_to(x.astype(np.float32), ph, pw)
    out = np.empty((ph, pw, 3), np.float32)
    mask = np.empty((ph, pw), np.uint8)
    lib.normalize_pad_image(img, h, w, ph, pw, out, mask)
    return out, mask.astype(bool)


def greedy_nms(boxes: np.ndarray, scores: np.ndarray, thr: float) -> np.ndarray:
    lib = _load()
    if not lib:
        from ..ops.nms import nms_numpy

        return nms_numpy(boxes, scores, thr)
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    keep = np.empty(len(boxes), np.int64)
    n = lib.greedy_nms(boxes, scores, len(boxes), thr, keep)
    return keep[:n].copy()
