"""Native (C++) runtime components.

The reference framework leans on compiled code for its non-device hot
paths — pycocotools' C evaluator core, habitat-sim's C++ renderer, the
ms_deform_attn CUDA extension (SURVEY §2.3). This package holds the
TPU-native framework's compiled host-side analogs, built on demand with
the system toolchain and bound via ctypes (pybind11 is not available):

  eval_core.cc  IoU + COCO greedy matching + PR-curve sampling
                (pycocotools maskApi/_mask analog)

Importing this package never fails: if the toolchain or build is
unavailable, `eval_core` is None and callers fall back to pure numpy.
"""

from embodied_object_detection_tpu.native.build import load_eval_core

eval_core = load_eval_core()

__all__ = ["eval_core"]
