from vrenderer_tpu.profiler.profiler import (
    FrameProfiler,
    PassTimer,
    REFERENCE_GPU_COUNTERS,
    REFERENCE_CPU_COUNTERS,
)

__all__ = [
    "FrameProfiler",
    "PassTimer",
    "REFERENCE_GPU_COUNTERS",
    "REFERENCE_CPU_COUNTERS",
]
