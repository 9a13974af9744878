"""Benchmark: 1080p terrain flythrough FPS on one TPU chip.

Matches BASELINE.md config 2 (full quadtree LOD + frustum culling,
scripted camera flythrough, 1080p) against the driver's north-star target
of >= 120 FPS (BASELINE.json; the reference publishes no numbers of its
own). Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

Measurement notes: the axon tunnel to the chip has ~150 ms host RTT and
its async dispatch does not block on completion, so wall-timing a single
dispatch is meaningless. Frames are chained on-device (each frame's
camera perturbed by a data dependency on nothing host-side) inside ONE
jitted scan; the per-frame time is (t_long - t_short) / (n_long -
n_short) across two chain lengths, which cancels RTT and fixed overheads.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 120.0  # north-star target (BASELINE.json / BASELINE.md)

# default: 1080p padded to whole 128px supertile rows (BASELINE config 2);
# --mode 4k switches to BASELINE config 5 (and prints per-pass counters
# to stderr)
if "--mode" in sys.argv and "4k" in sys.argv:
    WIDTH, HEIGHT = 3840, 2176
else:
    WIDTH, HEIGHT = 1920, 1152


def build():
    from vrenderer_tpu.config import FrameConfig, TerrainSettings
    from vrenderer_tpu.renderer import Renderer, FrameParams
    from vrenderer_tpu.terrain import heightmap as hmod
    from vrenderer_tpu.camera import flythrough

    cfg = FrameConfig(
        width=WIDTH, height=HEIGHT,
        terrain=TerrainSettings(max_instances=1024),
    )
    hm = hmod.procedural_heightmap(256)
    alb = hmod.procedural_albedo(hm)
    on_tpu = jax.default_backend() == "tpu"
    # 4K has ~4x the supertiles: 1080p fits ~900 work items in 2048,
    # 4K needs ~2700 (the overflow probe asserts otherwise)
    r = Renderer(cfg, hm, alb, raster_backend="pallas",
                 interpret=not on_tpu,
                 max_work=4096 if HEIGHT > 1200 else 2048)
    params = FrameParams.default()
    cams = flythrough(64, heightmap=hm, max_height=400.0)
    return r, params, cams


def chain_fn(renderer, params, cams, n):
    """n flythrough frames inside one jit; returns a scalar that depends
    on every frame so nothing is elided."""
    from vrenderer_tpu.camera import Camera

    def body(i, acc):
        cam = Camera(
            eye=cams.eye[i % 64], target=cams.target[i % 64],
            up=cams.up[i % 64],
        )
        out = renderer._frame(cam, params)
        # Whole-image reductions: XLA must not slice-sink/prune the
        # full-screen lighting/tonemap/sky work behind a few pixels.
        return acc + out.ldr.mean() + out.depth.mean()

    return jax.jit(lambda: jax.lax.fori_loop(0, n, body, jnp.float32(0.0)))


def timed(f):
    t0 = time.perf_counter()
    v = float(f())
    return time.perf_counter() - t0, v


def main():
    renderer, params, cams = build()
    # overflow honesty: a too-small max_work/max_instances renders holes;
    # fail the bench loudly rather than publish numbers on a broken frame
    from vrenderer_tpu.camera import Camera

    probe = renderer.render(
        Camera(eye=cams.eye[0], target=cams.target[0], up=cams.up[0]), params
    )
    assert not bool(probe.overflow), (
        f"work-list/instance overflow at bench config "
        f"(work={int(probe.num_work_items)}/{renderer.max_work})"
    )
    short_n, long_n = 4, 20
    f_short = chain_fn(renderer, params, cams, short_n)
    f_long = chain_fn(renderer, params, cams, long_n)
    timed(f_short)  # compile
    timed(f_long)   # compile
    ts = min(timed(f_short)[0] for _ in range(3))
    tl = min(timed(f_long)[0] for _ in range(3))
    per_frame = max((tl - ts) / (long_n - short_n), 1e-6)
    fps = 1.0 / per_frame
    is_4k = HEIGHT > 1200
    if is_4k:
        # BASELINE config 5: per-pass counters alongside the headline
        try:
            from vrenderer_tpu.app import App
            from vrenderer_tpu.config import FrameConfig, TerrainSettings

            app = App(
                FrameConfig(width=WIDTH, height=HEIGHT,
                            terrain=TerrainSettings(max_instances=1024)),
                raster_backend=renderer.raster_backend,
            )
            app.renderer = renderer
            timer = app.profile_passes()
            print(timer.table(), file=sys.stderr)
        except Exception as e:  # pragma: no cover
            print(f"per-pass profiling failed: {e}", file=sys.stderr)
    print(json.dumps({
        "metric": "terrain_flythrough_4k_fps" if is_4k
        else "terrain_flythrough_1080p_fps",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
