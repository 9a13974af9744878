"""Native C++ runtime library: build, profiler ring, fBm generation."""

import time

import numpy as np
import pytest

from vrenderer_tpu.utils import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_native_profiler_scoped_events():
    p = native.NativeProfiler(1024)
    p.new_frame()
    with p.scope("CPU Frame"):
        with p.scope("Render"):
            time.sleep(0.002)
        with p.scope("Present"):
            pass
    evs = p.events()
    by_name = {e["name"]: e for e in evs}
    assert set(by_name) == {"CPU Frame", "Render", "Present"}
    assert by_name["Render"]["depth"] == 1
    assert by_name["CPU Frame"]["depth"] == 0
    dur = by_name["Render"]["end_ns"] - by_name["Render"]["begin_ns"]
    assert 1_500_000 < dur < 80_000_000
    # nesting containment
    assert (by_name["CPU Frame"]["begin_ns"] <= by_name["Render"]["begin_ns"])
    assert (by_name["CPU Frame"]["end_ns"] >= by_name["Render"]["end_ns"])


def test_native_profiler_capacity_and_reset():
    p = native.NativeProfiler(4)
    for i in range(8):
        p.begin(f"e{i}")
        p.end()
    assert len(p.events()) == 4  # ring capacity respected (drops extras)
    p.reset()
    assert p.events() == []


def test_native_fbm_deterministic_and_bounded():
    a = native.fbm_heightmap(128, seed=42)
    b = native.fbm_heightmap(128, seed=42)
    c = native.fbm_heightmap(128, seed=43)
    assert a is not None
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.min() >= 0.0 and a.max() <= 1.0
    assert 0.2 < a.mean() < 0.8
    # has actual structure, not constant
    assert a.std() > 0.05
