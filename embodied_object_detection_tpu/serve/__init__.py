"""Serving / deployment exports."""

from embodied_object_detection_tpu.serve.export import (  # noqa: F401
    export_frame_step, load_frame_step)
