"""Build + ctypes-bind the native eval core.

Compiles eval_core.cc with the system g++ on first *use* (never at
import time — a cold build can take tens of seconds). The artifact name
embeds a hash of the source, so a stale or foreign binary (different
source, or one copied across machines) is never loaded; binaries are
gitignored and rebuilt per machine with portable flags (-O3 only, no
-march=native — the evaluator must not SIGILL on older ISAs).

No pip/pybind11 — plain C ABI + ctypes, per the environment's toolchain
constraints. Set EODT_NO_NATIVE=1 to force the pure-Python evaluator
paths.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "eval_core.cc")

_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _so_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(_DIR, f"_eval_core_{digest}.so")


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
            _f64, _f64, _i64, _i64, _f64, _f64, _i64, ctypes.c_int64,
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

    def evaluate_category(self, g_boxes, g_areas, g_ids, g_off, d_boxes,
                          d_scores, d_off, thrs, area_rng, max_dets: int):
        """Full per-category COCOeval.evaluateImg sweep in one call.

        Concatenated per-image inputs (xywh boxes + global annotation ids)
        with prefix offsets; returns (scores [N], dt_m [T,N], dt_ig [T,N],
        n_gt) where N is the max_dets-capped detection total in image
        order, dets sorted score-descending within each image. dt_m holds
        the matched gt's global ann id (0 = unmatched — deliberately
        aliasing ann id 0, the pycocotools quirk).
        """
        g_boxes = np.ascontiguousarray(g_boxes, np.float64).reshape(-1, 4)
        g_areas = np.ascontiguousarray(g_areas, np.float64).reshape(-1)
        g_ids = np.ascontiguousarray(g_ids, np.int64).reshape(-1)
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
            g_boxes, g_areas, g_ids, g_off, d_boxes, d_scores, d_off,
            n_imgs,
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


def _build(so: str) -> bool:
    # compile to a process-unique temp name, then rename atomically into
    # place: concurrent processes (parallel pytest, the multichip dryrun)
    # must never CDLL a half-linked file or have g++ O_TRUNC a library
    # another process already mapped
    tmp = f"{so}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


_CACHE: dict = {}


def load_eval_core() -> Optional[EvalCore]:
    """Build (if needed) and bind the core; cached after the first call.
    Returns None when disabled or the toolchain is unavailable."""
    if os.environ.get("EODT_NO_NATIVE"):
        return None
    if "core" in _CACHE:
        return _CACHE["core"]
    core = None
    try:
        so = _so_path()
        if not os.path.exists(so):
            if not _build(so):
                _CACHE["core"] = None
                return None
        core = EvalCore(ctypes.CDLL(so))
    except OSError:
        core = None
    _CACHE["core"] = core
    return core
