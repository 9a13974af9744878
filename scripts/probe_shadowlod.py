"""Measure the map-mode light-selection knobs on hardware.

For each (shadow_select, shadow_lod_bias) setting:
  * flythrough FPS at the map bench config (same two-length on-device
    chain as bench.py --mode map), and
  * shadow QUALITY vs the bias-0 main-eye baseline: MAE / p99 / the
    fraction of terrain-receiver shadow factors off by > 0.05, measured
    on the full shadow_field (the quantity every lit pixel consumes),
    plus mean |ldr| pixel delta on a representative frame.

Usage: python scripts/probe_shadowlod.py [--settings main:0,main:2,light:0]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vrenderer_tpu.config import FrameConfig, TerrainSettings
from vrenderer_tpu.renderer import Renderer, FrameParams
from vrenderer_tpu.terrain import heightmap as hmod
from vrenderer_tpu.camera import flythrough, Camera

WIDTH, HEIGHT = 1920, 1152


def build(select, bias):
    ts = TerrainSettings(max_instances=1024)
    cfg = FrameConfig(
        width=WIDTH, height=HEIGHT, terrain=ts, shadow_mode="map",
        shadow_resolution=2048, shadow_select=select, shadow_lod_bias=bias,
    )
    hm = hmod.procedural_heightmap(256)
    alb = hmod.procedural_albedo(hm)
    on_tpu = jax.default_backend() == "tpu"
    r = Renderer(cfg, hm, alb, raster_backend="pallas",
                 interpret=not on_tpu, max_work=2048, max_active=768)
    return r, hm


def chain(renderer, params, cams, n):
    def body(i, acc):
        cam = Camera(eye=cams.eye[i % 64], target=cams.target[i % 64],
                     up=cams.up[i % 64])
        out = renderer._frame(cam, params)
        return acc + out.ldr.mean() + out.depth.mean()

    return jax.jit(lambda: jax.lax.fori_loop(0, n, body, jnp.float32(0.0)))


def timed(f):
    t0 = time.perf_counter()
    float(f())
    return time.perf_counter() - t0


def shadow_field_of(r, params):
    f = jax.jit(lambda p: r.shadow_field_from_map(
        r._light_depth_pass(p, camera_pos=jnp.asarray(
            [60.0, 380.0, -40.0], jnp.float32))[0],
        r._light_depth_pass(p, camera_pos=jnp.asarray(
            [60.0, 380.0, -40.0], jnp.float32))[4],
        p,
    ))
    return np.asarray(f(params))


def main():
    settings = [("main", 0), ("main", 1), ("main", 2), ("main", 3),
                ("light", 0)]
    if "--settings" in sys.argv:
        raw = sys.argv[sys.argv.index("--settings") + 1]
        settings = [
            (s.split(":")[0], int(s.split(":")[1])) for s in raw.split(",")
        ]

    params = FrameParams.default()
    base_field = None
    base_ldr = None
    ts = TerrainSettings(max_instances=1024)
    hm = hmod.procedural_heightmap(256)
    cams = flythrough(64, heightmap=hm, max_height=400.0,
                      world_size=ts.world_size)
    cam0 = Camera(eye=cams.eye[7], target=cams.target[7], up=cams.up[7])

    for select, bias in settings:
        r, _ = build(select, bias)
        out = r.render(cam0, params)
        ovf = bool(out.overflow)
        ldr = np.asarray(out.ldr)
        field = shadow_field_of(r, params)
        if base_field is None:
            base_field, base_ldr = field, ldr
            q = "baseline"
        else:
            d = np.abs(field - base_field)
            dl = np.abs(ldr - base_ldr)
            q = (f"field MAE {d.mean():.4f} p99 {np.percentile(d, 99):.4f}"
                 f" frac>0.05 {(d > 0.05).mean():.4f}"
                 f" | ldr MAE {dl.mean():.4f} max {dl.max():.3f}")
        f_short = chain(r, params, cams, 4)
        f_long = chain(r, params, cams, 20)
        timed(f_short)
        timed(f_long)
        t_s = min(timed(f_short) for _ in range(3))
        t_l = min(timed(f_long) for _ in range(3))
        fps = 16.0 / max(t_l - t_s, 1e-6)
        print(f"{select}:{bias}  fps {fps:6.2f}  overflow {ovf}  {q}",
              flush=True)


if __name__ == "__main__":
    main()
