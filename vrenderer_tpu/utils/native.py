"""ctypes bindings for the native runtime library (native/vrt_native.cpp).

Builds lazily with make/g++ on first use; everything here has a pure
Python fallback so the framework works without a toolchain."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvrt_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False

NAME_LEN = 64


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.vrt_profiler_init.argtypes = [ctypes.c_int]
        lib.vrt_profiler_begin.argtypes = [ctypes.c_char_p]
        lib.vrt_profiler_begin.restype = ctypes.c_int
        lib.vrt_profiler_count.restype = ctypes.c_int
        lib.vrt_profiler_dump.argtypes = [
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_char_p,
        ]
        lib.vrt_now_ns.restype = ctypes.c_uint64
        lib.vrt_fbm_heightmap.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_uint32,
            ctypes.c_int, ctypes.c_float,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return load() is not None


class NativeProfiler:
    """Thin wrapper over the native scoped-event ring (the reference's
    CPUProfiler analog, Profiler.cpp:409-490)."""

    def __init__(self, capacity: int = 65536):
        self.lib = load()
        if self.lib is None:
            raise RuntimeError("native library unavailable")
        self.lib.vrt_profiler_init(capacity)
        self.capacity = capacity

    def new_frame(self):
        self.lib.vrt_profiler_new_frame()

    def begin(self, name: str):
        self.lib.vrt_profiler_begin(name.encode())

    def end(self):
        self.lib.vrt_profiler_end()

    def scope(self, name: str):
        prof = self

        class _S:
            def __enter__(self):
                prof.begin(name)

            def __exit__(self, *a):
                prof.end()

        return _S()

    def events(self):
        """Returns list of dicts: name, begin_ns, end_ns, depth, frame."""
        n = self.lib.vrt_profiler_count()
        times = np.zeros(2 * n, np.uint64)
        meta = np.zeros(2 * n, np.int32)
        names = ctypes.create_string_buffer(n * NAME_LEN)
        if n:
            self.lib.vrt_profiler_dump(
                times.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                names,
            )
        out = []
        for i in range(n):
            raw = names.raw[i * NAME_LEN:(i + 1) * NAME_LEN]
            out.append(
                {
                    "name": raw.split(b"\0", 1)[0].decode(),
                    "begin_ns": int(times[2 * i]),
                    "end_ns": int(times[2 * i + 1]),
                    "depth": int(meta[2 * i]),
                    "frame": int(meta[2 * i + 1]),
                }
            )
        return out

    def reset(self):
        self.lib.vrt_profiler_reset()


def fbm_heightmap(resolution: int, seed: int = 1234, octaves: int = 8,
                  gain: float = 0.55) -> Optional[np.ndarray]:
    """Native fBm heightmap in [0, 1]; None if the library is missing."""
    lib = load()
    if lib is None:
        return None
    out = np.zeros(resolution * resolution, np.float32)
    lib.vrt_fbm_heightmap(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        resolution, seed, octaves, gain,
    )
    return out.reshape(resolution, resolution)
