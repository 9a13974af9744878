"""Cumulative-prefix timing of the terrain pipeline on hardware.

Isolated per-stage chains let XLA prune everything downstream of the one
scalar consumed, so they wildly under-report. Instead: time composed
prefixes of the real pipeline (select -> vertex -> fused setup+pack ->
worklist -> raster -> image), each consuming its outputs via reductions;
differences between prefixes are the stage costs as they actually
compose. Chained-iteration timing (axon RTT cancels).

Usage: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/prep_time.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.kexp import WIDTH, HEIGHT
from vrenderer_tpu.ops import raster_pallas as rp
from vrenderer_tpu.ops import shadow as shmod, vertex as vmod
from vrenderer_tpu.config import FrameConfig, TerrainSettings
from vrenderer_tpu.renderer import Renderer, FrameParams
from vrenderer_tpu.terrain import heightmap as hmod, quadtree
from vrenderer_tpu.camera import flythrough, Camera, make_view_constants
from vrenderer_tpu.utils import math3d

MAX_ACTIVE = 512


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def timed(name, fn, arg0, n_small=4, n_big=12):
    def chain(n):
        def body(i, carry):
            a, acc = carry
            a2, s = fn(a)
            return (a2, acc + s)
        return jax.jit(lambda a: jax.lax.fori_loop(
            0, n, body, (a, jnp.float32(0.0)))[1])

    f4, f12 = chain(n_small), chain(n_big)
    float(f4(arg0)); float(f12(arg0))
    t4 = min(_t(lambda: float(f4(arg0))) for _ in range(3))
    t12 = min(_t(lambda: float(f12(arg0))) for _ in range(3))
    ms = (t12 - t4) / (n_big - n_small) * 1000
    print(f"{name:28s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    cfg = FrameConfig(width=WIDTH, height=HEIGHT,
                      terrain=TerrainSettings(max_instances=1024))
    ts = cfg.terrain
    T = ts.tris_per_instance
    hm = hmod.procedural_heightmap(256)
    alb = hmod.procedural_albedo(hm)
    r = Renderer(cfg, hm, alb, raster_backend="pallas", max_work=2048,
                 max_active=MAX_ACTIVE)
    params = FrameParams.default()
    cams = flythrough(64, heightmap=hm, max_height=400.0)
    cam = Camera(eye=cams.eye[0], target=cams.target[0], up=cams.up[0])
    vc = make_view_constants(cam, cfg.width, cfg.height, cfg.vfov_degrees,
                             cfg.z_near, cfg.z_far)
    sf = shmod.horizon_shadow_field(hm, params.max_height,
                                    float(ts.world_size),
                                    params.light_direction)
    planes = math3d.frustum_planes(vc["world_to_clip"])

    def run(eye, upto):
        inst = quadtree.select_all_surfaces(ts, eye, planes,
                                            ts.lod_ranges())
        inst = r._clip_active(inst)
        if upto == "select":
            return inst.count.astype(jnp.float32) * 1e-12
        vo = vmod.vertex_stage(ts, inst, eye, hm, alb, sf,
                               params.max_height, ts.lod_ranges(),
                               nrm_field=r._nrm_field)
        if upto == "vertex":
            return vo.world.sum() * 1e-12 + vo.attrs.sum() * 1e-12
        pk, bb, us, dd = r._packed_geometry(
            vo.world, vo.attrs, inst.valid, vc["world_to_clip"],
            cfg.width, cfg.height)
        if upto == "packed":
            # clip: batch_meta holds FAR sentinels that poison the chain
            return (pk.tri_data.sum() + pk.tri_cols.sum()
                    + jnp.clip(pk.batch_meta, -1e6, 1e6).sum()
                    + bb.sum() * 1e-12
                    + jnp.clip(dd, 0, 1e6).sum()) * 1e-12
        wk = rp.build_work_list(
            bb, us, cfg.width, cfg.height, tile=cfg.raster.tile_w,
            tris_per_inst=T, max_work=2048, order_key=dd, packed=pk,
            sub_h=cfg.raster.subtile_h, compact_k=cfg.raster.compact_k)
        if upto == "worklist":
            return (wk.meta.sum() + wk.sub_rounds.sum()).astype(
                jnp.float32) * 1e-12
        z, pid, at, invw = rp.rasterize_pallas(
            pk, wk, cfg.width, cfg.height, tile=cfg.raster.tile_w,
            sub_h=cfg.raster.subtile_h, compact_k=cfg.raster.compact_k,
            max_work=2048)
        if upto == "raster":
            # clip z: background is FAR = 3e38 and would poison the chain
            return (jnp.clip(z, 0.0, 2.0).mean() + at.mean()
                    + pid.sum().astype(jnp.float32) * 1e-12)
        raise ValueError(upto)

    for upto in ("select", "vertex", "packed", "worklist", "raster"):
        def fn(eye, _u=upto):
            s = run(eye, _u)
            return eye + s * 1e-30, s
        timed(f"prefix:{upto}", fn, cams.eye[0])

    def frame_fn(eye):
        c = Camera(eye=eye, target=cams.target[0], up=cams.up[0])
        out = r._frame(c, params)
        s = out.ldr.mean()
        return eye + s * 1e-30, s

    timed("full _frame", frame_fn, cams.eye[0])


if __name__ == "__main__":
    main()
