"""Time the terrain-pass stages on hardware: pack_tri_data,
build_work_list, kernel, and the full jitted frame. Chained-iteration
timing (axon RTT cancels). Throwaway measurement tooling.

Usage: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/prep_time.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.kexp import build_setup, WIDTH, HEIGHT
from vrenderer_tpu.ops import raster_pallas as rp


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def timed(name, fn, arg0, n_small=4, n_big=12):
    """fn(carry_arg) -> (next_arg, scalar); chained n times."""
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
    print(f"{name:28s} {ms:8.2f} ms")
    return ms


def main():
    cfg, setup, bbox, usable, dist = build_setup(0)
    ts = cfg.terrain
    I, T = ts.max_instances, ts.tris_per_instance

    # stage 1: pack_tri_data
    def pack_fn(edge):
        s2 = setup._replace(edge=edge)
        p = rp.pack_tri_data(s2, I, T, tri_batch=cfg.raster.tri_batch)
        sc = p.tri_splits[0, 0, 0, 0].astype(jnp.float32)
        return edge + (sc * 1e-30).astype(edge.dtype), sc * 0.0

    timed("pack_tri_data", pack_fn, setup.edge)

    packed = jax.jit(
        lambda s: rp.pack_tri_data(s, I, T, tri_batch=cfg.raster.tri_batch)
    )(setup)

    # stage 2: build_work_list
    def wl_fn(args):
        bb, pk = args
        w = rp.build_work_list(
            bb, usable, cfg.width, cfg.height, tile=cfg.raster.tile_w,
            tris_per_inst=T, max_work=2048, order_key=dist, packed=pk,
            sub_h=cfg.raster.subtile_h, compact_k=cfg.raster.compact_k)
        sc = w.sub_rounds.sum().astype(jnp.float32)
        return (bb + sc * 1e-30, pk), sc * 0.0

    timed("build_work_list", wl_fn, (bbox, packed))

    work = jax.jit(lambda bb, pk: rp.build_work_list(
        bb, usable, cfg.width, cfg.height, tile=cfg.raster.tile_w,
        tris_per_inst=T, max_work=2048, order_key=dist, packed=pk,
        sub_h=cfg.raster.subtile_h, compact_k=cfg.raster.compact_k))(
            bbox, packed)

    # stage 3: kernel
    def k_fn(args):
        splits, pk, wk = args
        p = rp.PackedTris(splits, pk.tri_cols, pk.batch_meta)
        z, _, _, _ = rp.rasterize_pallas(
            p, wk, cfg.width, cfg.height, tile=cfg.raster.tile_w,
            sub_h=cfg.raster.subtile_h, compact_k=cfg.raster.compact_k,
            max_work=2048)
        s = z.mean()
        return (splits + (s * 1e-30).astype(splits.dtype), pk, wk), s

    timed("rasterize_pallas", k_fn, (packed.tri_splits, packed, work))

    # stage 3b: vertex + setup + bbox + lighting chain
    from vrenderer_tpu.config import FrameConfig as _FC, TerrainSettings as _TS
    from vrenderer_tpu.renderer import Renderer as _R, FrameParams as _FP
    from vrenderer_tpu.terrain import heightmap as hmod, quadtree
    from vrenderer_tpu.camera import flythrough as _fly, Camera as _Cam, \
        make_view_constants as _mvc
    from vrenderer_tpu.ops import shadow as shmod, vertex as vmod, \
        raster as rop, lighting as lmod
    from vrenderer_tpu.utils import math3d

    hm = hmod.procedural_heightmap(256)
    alb = hmod.procedural_albedo(hm)
    cfg2 = cfg
    ts2 = cfg2.terrain
    params = None
    from vrenderer_tpu.renderer import FrameParams
    params = FrameParams.default()
    cams = _fly(64, heightmap=hm, max_height=400.0)
    cam = _Cam(eye=cams.eye[0], target=cams.target[0], up=cams.up[0])
    vc = _mvc(cam, cfg2.width, cfg2.height, cfg2.vfov_degrees, cfg2.z_near,
              cfg2.z_far)
    sf = shmod.horizon_shadow_field(hm, params.max_height,
                                    float(ts2.world_size),
                                    params.light_direction)
    planes = math3d.frustum_planes(vc["world_to_clip"])
    instances = quadtree.select_all_surfaces(ts2, vc["camera_pos"], planes,
                                             ts2.lod_ranges())

    def shadow_fn(lx):
        f = shmod.horizon_shadow_field(hm, params.max_height,
                                       float(ts2.world_size), lx)
        s = f.mean()
        return lx + s * 1e-30, s

    timed("horizon_shadow_field", shadow_fn, params.light_direction)

    def select_fn(eye):
        inst = quadtree.select_all_surfaces(ts2, eye, planes,
                                            ts2.lod_ranges())
        s = inst.count.astype(jnp.float32)
        return eye + s * 1e-30, s * 0.0

    timed("quadtree select", select_fn, vc["camera_pos"])

    def vtx_fn(eye):
        vout = vmod.vertex_stage(ts2, instances, eye, hm, alb, sf,
                                 params.max_height, ts2.lod_ranges())
        s = vout.world.mean()
        return eye + s * 1e-30, s

    timed("vertex_stage", vtx_fn, vc["camera_pos"])

    vout = jax.jit(lambda eye: vmod.vertex_stage(
        ts2, instances, eye, hm, alb, sf, params.max_height,
        ts2.lod_ranges()))(vc["camera_pos"])
    idx = _R(cfg2, hm, alb, raster_backend="pallas").tri_indices

    def setup_fn(w):
        st = rop.setup_triangles(w, vout.attrs, instances.valid, idx,
                                 vc["world_to_clip"], cfg2.width,
                                 cfg2.height)
        s = st.edge.mean()
        return w + (s * 1e-30).astype(w.dtype), s

    timed("setup_triangles", setup_fn, vout.world)

    def bbox_fn(w):
        bb, us, dd = rp.instance_screen_bbox(
            w, vc["world_to_clip"], cfg2.width, cfg2.height,
            instances.valid)
        s = bb.mean()
        return w + (s * 1e-30).astype(w.dtype), s

    timed("instance_screen_bbox", bbox_fn, vout.world)

    # stage 4: full frame via the renderer
    from vrenderer_tpu.app import App
    from vrenderer_tpu.config import FrameConfig, TerrainSettings
    from vrenderer_tpu.camera import flythrough, Camera

    app = App(FrameConfig(width=WIDTH, height=HEIGHT,
                          terrain=TerrainSettings(max_instances=1024)))
    cams = flythrough(64, heightmap=app.renderer.heightmap,
                      max_height=400.0)
    r = app.renderer
    params = app.params

    def frame_fn(eye):
        cam = Camera(eye=eye, target=cams.target[0], up=cams.up[0])
        out = r._frame(cam, params)
        s = out.ldr.mean()
        return eye + s * 1e-30, s

    timed("full _frame", frame_fn, cams.eye[0])


if __name__ == "__main__":
    main()
