"""Raster-kernel experiment bench: compaction-kernel timings + work-list
statistics.

Builds the real 1080p bench scene once, then times the production kernel
at different (compact_k, sub_h) settings via chained on-device iteration
(axon RTT cancels out). Also dumps the (item, subtile) round statistics
that size the compaction design. Throwaway measurement tooling — not part
of the library.

Usage (TPU): JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
  python scripts/kexp.py [stats] [k=16,32,64] [sub=8] [cam=0]
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

WIDTH, HEIGHT = 1920, 1152


def build_setup(cam_idx=0, max_active=512):
    from vrenderer_tpu.config import FrameConfig, TerrainSettings
    from vrenderer_tpu.renderer import Renderer, FrameParams
    from vrenderer_tpu.terrain import heightmap as hmod, quadtree
    from vrenderer_tpu.camera import flythrough, Camera, make_view_constants
    from vrenderer_tpu.ops import shadow, vertex
    from vrenderer_tpu.utils import math3d

    cfg = FrameConfig(width=WIDTH, height=HEIGHT,
                      terrain=TerrainSettings(max_instances=1024))
    hm = hmod.procedural_heightmap(256)
    alb = hmod.procedural_albedo(hm)
    r = Renderer(cfg, hm, alb, raster_backend="pallas", interpret=False,
                 max_work=2048, max_active=max_active)
    params = FrameParams.default()
    cams = flythrough(64, heightmap=hm, max_height=400.0)
    cam = Camera(eye=cams.eye[cam_idx], target=cams.target[cam_idx],
                 up=cams.up[cam_idx])

    ts = cfg.terrain
    vc = make_view_constants(cam, cfg.width, cfg.height, cfg.vfov_degrees,
                             cfg.z_near, cfg.z_far)
    shadow_field = shadow.horizon_shadow_field(
        hm, params.max_height, float(ts.world_size), params.light_direction)
    planes = math3d.frustum_planes(vc["world_to_clip"])
    instances = quadtree.select_all_surfaces(
        ts, vc["camera_pos"], planes, ts.lod_ranges())
    instances = r._clip_active(instances)
    vout = vertex.vertex_stage(ts, instances, vc["camera_pos"], hm, alb,
                               shadow_field, params.max_height,
                               ts.lod_ranges(), nrm_field=r._nrm_field)
    packed, bbox, usable, dist = r._packed_geometry(
        vout.world, vout.attrs, instances.valid, vc["world_to_clip"],
        cfg.width, cfg.height)
    return cfg, packed, bbox, usable, dist


def build_work(cfg, packed, bbox, usable, dist, compact_k, sub_h,
               max_work=2048, win_w=128, tile=128, tile_h=0):
    ts = cfg.terrain
    work = rp.build_work_list(
        bbox, usable, cfg.width, cfg.height, tile=tile,
        tris_per_inst=ts.tris_per_instance, max_work=max_work,
        order_key=dist, packed=packed, sub_h=sub_h, compact_k=compact_k,
        win_w=win_w, tile_h=tile_h)
    return packed, work


def work_stats(cfg, work, compact_k, sub_h):
    meta = np.asarray(work.meta)
    rounds = np.asarray(work.sub_rounds)   # (n_sub, W)
    n_items = int(np.asarray(work.num_items))
    valid_items = meta[5] == 1
    active = rounds > 0
    print(f"K={compact_k} sub_h={sub_h}: items {n_items} "
          f"(valid {valid_items.sum()}), active (item,subtile) pairs "
          f"{active.sum()}, rounds {rounds.sum()} "
          f"(rows {rounds.sum() * compact_k}), max rounds {rounds.max()}")


def time_config(cfg, setup, bbox, usable, dist, compact_k, sub_h,
                max_work=2048, win_w=128, depth="", tile=128, tile_h=0):
    packed, work = build_work(cfg, setup, bbox, usable, dist, compact_k,
                              sub_h, max_work, win_w, tile=tile,
                              tile_h=tile_h)
    work_stats(cfg, work, compact_k, sub_h)

    def call(splits):
        p = rp.PackedTris(splits, packed.tri_cols, packed.batch_meta)
        if depth == "depth":
            return rp.rasterize_pallas_depth(
                p, work, cfg.width, cfg.height, tile=tile, tile_h=tile_h,
                sub_h=sub_h, compact_k=compact_k, max_work=max_work,
                win_w=win_w)
        if depth == "zid":
            z, _ = rp.rasterize_pallas_zid(
                p, work, cfg.width, cfg.height, tile=tile, tile_h=tile_h,
                sub_h=sub_h, compact_k=compact_k, max_work=max_work,
                win_w=win_w)
            return z[:cfg.height, :cfg.width]
        if depth == "two":
            z, idb, attrs, _ = rp.rasterize_pallas_two_phase(
                p, work, cfg.width, cfg.height, tile=tile, tile_h=tile_h,
                sub_h=sub_h, compact_k=compact_k, max_work=max_work,
                win_w=win_w)
            # consume attrs too so the resolve pass is not pruned
            return z + attrs[..., 0] * 1e-30
        z, idb, attrs, _ = rp.rasterize_pallas(
            p, work, cfg.width, cfg.height, tile=tile, tile_h=tile_h,
            sub_h=sub_h, compact_k=compact_k, max_work=max_work,
            win_w=win_w)
        if depth == "fullc":   # full kernel, attrs consumed (fair vs two)
            return z + attrs[..., 0] * 1e-30
        return z

    if depth == "fstats":
        # winner-filter effectiveness: rounds surviving phase 2
        _, id_pad = rp.rasterize_pallas_zid(
            packed, work, cfg.width, cfg.height, tile=tile,
            sub_h=sub_h, compact_k=compact_k, max_work=max_work,
            win_w=win_w)
        work2 = rp.filter_work_to_winners(
            work, id_pad, cfg.terrain.tris_per_instance, cfg.width,
            cfg.height, tile=tile, sub_h=sub_h, win_w=win_w)
        r1 = np.asarray(work.sub_rounds)
        r2 = np.asarray(work2.sub_rounds)
        m2 = np.asarray(work2.meta)
        print(f"  filter: rounds {r1.sum()} -> {r2.sum()} "
              f"({r2.sum()/max(r1.sum(),1):.2f}x), live items "
              f"{(np.asarray(work.meta)[5]==1).sum()} -> {(m2[5]==1).sum()}")
        return 0.0

    def chain(n):
        def body(i, carry):
            splits, acc = carry
            z = call(splits)
            zc = jnp.clip(z, 0.0, 2.0)
            s = (zc[0, 0] * 1e-30).astype(splits.dtype)
            return (splits + s, acc + zc.mean())
        return jax.jit(lambda s: jax.lax.fori_loop(
            0, n, body, (s, jnp.float32(0.0)))[1])

    f4, f12 = chain(4), chain(12)
    sp = packed.tri_data
    float(f4(sp)); float(f12(sp))  # compile
    t4 = min(_t(lambda: float(f4(sp))) for _ in range(3))
    t12 = min(_t(lambda: float(f12(sp))) for _ in range(3))
    ms = (t12 - t4) / 8 * 1000
    print(f"  kernel K={compact_k:3d} sub_h={sub_h} win={win_w} "
          f"tile={tile}x{tile_h or tile} depth={depth}: {ms:8.2f} ms/frame")
    return ms


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    args = sys.argv[1:] or ["stats"]
    cam_idx = 0
    ks = []
    sub_h = 8
    win_w = 128
    tile = 128
    tile_h = 0
    do_stats = False
    depth = ""
    for a in args:
        if a.startswith("cam="):
            cam_idx = int(a[4:])
        elif a.startswith("k="):
            ks = [int(v) for v in a[2:].split(",")]
        elif a.startswith("sub="):
            sub_h = int(a[4:])
        elif a.startswith("win="):
            win_w = int(a[4:])
        elif a.startswith("tile="):
            tile = int(a[5:])
        elif a.startswith("tileh="):
            tile_h = int(a[6:])
        elif a == "stats":
            do_stats = True
        elif a in ("depth", "zid", "two", "fullc", "fstats"):
            depth = a
    cfg, setup, bbox, usable, dist = build_setup(cam_idx)
    print(f"camera {cam_idx}")
    if do_stats and not ks:
        for k in (16, 32, 64):
            _, work = build_work(cfg, setup, bbox, usable, dist, k, sub_h)
            work_stats(cfg, work, k, sub_h)
    for k in ks:
        time_config(cfg, setup, bbox, usable, dist, k, sub_h, win_w=win_w,
                    depth=depth, tile=tile, tile_h=tile_h)
