"""Native (C++) runtime components.

The reference framework leans on compiled code for its non-device hot
paths — pycocotools' C evaluator core, habitat-sim's C++ renderer, the
ms_deform_attn CUDA extension (SURVEY §2.3). This package holds the
TPU-native framework's compiled host-side analogs, built on demand with
the system toolchain and bound via ctypes (pybind11 is not available):

  eval_core.cc  IoU + COCO greedy matching + PR-curve sampling
                (pycocotools maskApi/_mask analog)

The build is LAZY: importing this package never compiles anything (a
cold g++ run can take tens of seconds); the first `load_eval_core()`
call builds and caches. `native.eval_core` resolves lazily via module
__getattr__ for convenience. If the toolchain or build is unavailable
the result is None and callers fall back to pure numpy.
"""

from embodied_object_detection_tpu.native.build import load_eval_core

__all__ = ["eval_core", "load_eval_core"]


def __getattr__(name):
    if name == "eval_core":
        return load_eval_core()
    raise AttributeError(name)
