from orb_slam3_vio_fixes_tpu.runtime.native import (
    NativeQueue,
    hamming_match,
    hamming_matrix,
    native_available,
)
from orb_slam3_vio_fixes_tpu.runtime.actors import PipelineRunner, StageTimes

__all__ = [
    "NativeQueue",
    "hamming_match",
    "hamming_matrix",
    "native_available",
    "PipelineRunner",
    "StageTimes",
]
