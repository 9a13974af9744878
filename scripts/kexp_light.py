"""Light-raster (shadow map) kernel experiments: the map-mode depth-only
raster at 2048^2 is the map frame's dominant cost (32.2 ms of 54.4 at
1080p, scripts/passes.py round 4). The depth kernel drops the winner
swap and 29 of 48 channels, so its round-term/eval-term balance differs
from the main kernel's — sub_h/K optima must be re-measured, not
assumed.

Usage (TPU): JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
  python scripts/kexp_light.py [k=32] [sub=8,16] [cam=0]
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

from vrenderer_tpu.ops import raster_pallas as rp


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def build_light_setup(cam_idx=0, max_active=768):
    from vrenderer_tpu.config import FrameConfig, TerrainSettings
    from vrenderer_tpu.renderer import Renderer, FrameParams
    from vrenderer_tpu.terrain import heightmap as hmod, quadtree
    from vrenderer_tpu.camera import flythrough
    from vrenderer_tpu.ops import shadow, vertex
    from vrenderer_tpu.utils import math3d

    cfg = FrameConfig(width=1920, height=1152,
                      terrain=TerrainSettings(max_instances=1024),
                      shadow_mode="map", shadow_resolution=2048)
    hm = hmod.procedural_heightmap(256)
    alb = hmod.procedural_albedo(hm)
    r = Renderer(cfg, hm, alb, raster_backend="pallas", interpret=False,
                 max_work=4096, max_active=max_active)
    params = FrameParams.default()
    cams = flythrough(64, heightmap=hm, max_height=400.0)
    ts = cfg.terrain
    res = cfg.shadow_resolution

    wtc, *_ = shadow.sun_shear_matrices(
        params.light_direction, float(ts.world_size), params.max_height,
        res)
    planes = math3d.frustum_planes(wtc)
    instances = quadtree.select_all_surfaces(
        ts, cams.eye[cam_idx], planes, ts.lod_ranges())
    instances = r._clip_active(instances)
    geom = vertex.vertex_geometry(
        ts, instances, cams.eye[cam_idx], hm, params.max_height,
        ts.lod_ranges())
    vout = vertex.VertexOutput(
        world=geom.world,
        attrs=jnp.zeros(geom.world.shape[:3] + (vertex.NUM_ATTRS,),
                        jnp.float32))
    packed, bbox, usable, dist = r._packed_geometry(
        vout.world, vout.attrs, instances.valid, wtc, res, res)
    print(f"light setup cam {cam_idx}: {int(instances.valid.sum())} "
          f"instances", flush=True)
    return cfg, packed, bbox, usable, dist


def time_depth(cfg, packed, bbox, usable, dist, compact_k, sub_h,
               max_work=4096, win_w=128):
    ts = cfg.terrain
    res = cfg.shadow_resolution
    work = rp.build_work_list(
        bbox, usable, res, res, tile=cfg.raster.tile_w,
        tris_per_inst=ts.tris_per_instance, max_work=max_work,
        order_key=dist, packed=packed, sub_h=sub_h, compact_k=compact_k,
        win_w=win_w)
    meta = np.asarray(work.meta)
    rounds = np.asarray(work.sub_rounds)
    print(f"K={compact_k} sub_h={sub_h}: items "
          f"{int(np.asarray(work.num_items))} (valid {(meta[5]==1).sum()}),"
          f" rounds {rounds.sum()} (rows {rounds.sum()*compact_k})",
          flush=True)

    def call(splits):
        p = rp.PackedTris(splits, packed.tri_cols, packed.batch_meta)
        return rp.rasterize_pallas_depth(
            p, work, res, res, tile=cfg.raster.tile_w, sub_h=sub_h,
            compact_k=compact_k, max_work=max_work, win_w=win_w)

    def chain(n):
        def body(i, carry):
            splits, acc = carry
            z = jnp.clip(call(splits), 0.0, 2.0)
            s = (z[0, 0] * 1e-30).astype(splits.dtype)
            return (splits + s, acc + z.mean())
        return jax.jit(lambda s: jax.lax.fori_loop(
            0, n, body, (s, jnp.float32(0.0)))[1])

    f4, f12 = chain(4), chain(12)
    sp = packed.tri_data
    float(f4(sp)); float(f12(sp))
    t4 = min(_t(lambda: float(f4(sp))) for _ in range(3))
    t12 = min(_t(lambda: float(f12(sp))) for _ in range(3))
    ms = (t12 - t4) / 8.0 * 1e3
    print(f"  light depth K={compact_k:3d} sub_h={sub_h} win={win_w}: "
          f"{ms:8.2f} ms/frame", flush=True)
    return ms


def main():
    ks = [32]
    subs = [8, 16]
    cam = 0
    for a in sys.argv[1:]:
        if a.startswith("k="):
            ks = [int(v) for v in a[2:].split(",")]
        elif a.startswith("sub="):
            subs = [int(v) for v in a[4:].split(",")]
        elif a.startswith("cam="):
            cam = int(a[4:])
    cfg, packed, bbox, usable, dist = build_light_setup(cam)
    for k in ks:
        for s in subs:
            time_depth(cfg, packed, bbox, usable, dist, k, s)


if __name__ == "__main__":
    main()
