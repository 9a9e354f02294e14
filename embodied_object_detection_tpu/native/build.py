"""Build + ctypes-bind the native eval core.

Compiles eval_core.cc with the system g++ on first use (cached next to
the source; rebuilt when the source is newer). No pip/pybind11 — plain
C ABI + ctypes, per the environment's toolchain constraints.

Set EODT_NO_NATIVE=1 to force the pure-Python evaluator paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "eval_core.cc")
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "_eval_core.so")

_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


class EvalCore:
    """numpy-friendly wrappers over the C ABI."""

    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.iou_xywh.argtypes = [_f64, ctypes.c_int64, _f64, ctypes.c_int64,
                                 _f64]
        lib.greedy_match.argtypes = [_f64, ctypes.c_int64, ctypes.c_int64,
                                     _u8, _f64, ctypes.c_int64,
                                     _i64, _i64, _u8]
        lib.precision_at_recall.argtypes = [_f64, _f64, ctypes.c_int64,
                                            ctypes.c_double, _f64,
                                            ctypes.c_int64, _f64]
        lib.evaluate_category.argtypes = [
            _f64, _f64, _i64, _f64, _f64, _i64, ctypes.c_int64,
            _f64, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
            ctypes.c_int64, ctypes.c_int64, _f64, _i64, _u8, _i64]
        lib.evaluate_category.restype = ctypes.c_int64

    def iou_xywh(self, dets: np.ndarray, gts: np.ndarray) -> np.ndarray:
        dets = np.ascontiguousarray(dets, np.float64).reshape(-1, 4)
        gts = np.ascontiguousarray(gts, np.float64).reshape(-1, 4)
        out = np.zeros((len(dets), len(gts)), np.float64)
        if len(dets) and len(gts):
            self._lib.iou_xywh(dets, len(dets), gts, len(gts), out)
        return out

    def greedy_match(self, ious: np.ndarray, g_ignore: np.ndarray,
                     thrs: np.ndarray):
        ious = np.ascontiguousarray(ious, np.float64)
        nd, ng = ious.shape
        g_ignore = np.ascontiguousarray(g_ignore, np.uint8).reshape(-1)
        thrs = np.ascontiguousarray(thrs, np.float64).reshape(-1)
        nt = len(thrs)
        dt_m = np.zeros((nt, nd), np.int64)
        gt_m = np.zeros((nt, ng), np.int64)
        dt_ig = np.zeros((nt, nd), np.uint8)
        self._lib.greedy_match(ious, nd, ng, g_ignore, thrs, nt,
                               dt_m, gt_m, dt_ig)
        return dt_m, gt_m, dt_ig.astype(bool)

    def evaluate_category(self, g_boxes, g_areas, g_off, d_boxes, d_scores,
                          d_off, thrs, area_rng, max_dets: int):
        """Full per-category COCOeval.evaluateImg sweep in one call.

        Concatenated per-image inputs (xywh boxes) with prefix offsets;
        returns (scores [N], dt_m [T,N], dt_ig [T,N], n_gt) where N is the
        max_dets-capped detection total in image order, dets sorted
        score-descending within each image.
        """
        g_boxes = np.ascontiguousarray(g_boxes, np.float64).reshape(-1, 4)
        g_areas = np.ascontiguousarray(g_areas, np.float64).reshape(-1)
        g_off = np.ascontiguousarray(g_off, np.int64)
        d_boxes = np.ascontiguousarray(d_boxes, np.float64).reshape(-1, 4)
        d_scores = np.ascontiguousarray(d_scores, np.float64).reshape(-1)
        d_off = np.ascontiguousarray(d_off, np.int64)
        thrs = np.ascontiguousarray(thrs, np.float64).reshape(-1)
        n_imgs = len(g_off) - 1
        nt = len(thrs)
        per_img = np.minimum(np.diff(d_off), max_dets)
        nd_cap = int(per_img.sum())
        scores = np.zeros(nd_cap, np.float64)
        dt_m = np.zeros((nt, nd_cap), np.int64)
        dt_ig = np.zeros((nt, nd_cap), np.uint8)
        n_gt = np.zeros(1, np.int64)
        written = self._lib.evaluate_category(
            g_boxes, g_areas, g_off, d_boxes, d_scores, d_off, n_imgs,
            thrs, nt, float(area_rng[0]), float(area_rng[1]),
            int(max_dets), nd_cap, scores, dt_m, dt_ig, n_gt)
        assert written == nd_cap, (written, nd_cap)
        return scores, dt_m, dt_ig.astype(bool), int(n_gt[0])

    def precision_at_recall(self, tp: np.ndarray, fp: np.ndarray,
                            n_gt: float, rec_thrs: np.ndarray) -> np.ndarray:
        tp = np.ascontiguousarray(tp, np.float64).reshape(-1)
        fp = np.ascontiguousarray(fp, np.float64).reshape(-1)
        rec_thrs = np.ascontiguousarray(rec_thrs, np.float64).reshape(-1)
        out = np.zeros(len(rec_thrs), np.float64)
        self._lib.precision_at_recall(tp, fp, len(tp), float(n_gt),
                                      rec_thrs, len(rec_thrs), out)
        return out


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def load_eval_core() -> Optional[EvalCore]:
    if os.environ.get("EODT_NO_NATIVE"):
        return None
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        return EvalCore(ctypes.CDLL(_SO))
    except OSError:
        return None
