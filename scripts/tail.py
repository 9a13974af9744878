"""Per-camera flythrough frame times + workload statistics (VERDICT r4
next #3): where does the 64-frame flythrough average exceed camera 0?

For each flythrough camera: the full-frame time via the standard
two-length on-device chain (one jit, camera as argument — no
recompiles), plus the workload terms that could explain it (selected
instances, work items, compaction rounds, covered pixels). Prints a
table + correlation summary backing docs/PERFORMANCE.md's tail section.

Usage (TPU): JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
    python scripts/tail.py [n=64] [reps=3]
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

from vrenderer_tpu.config import FrameConfig, TerrainSettings
from vrenderer_tpu.renderer import Renderer, FrameParams
from vrenderer_tpu.terrain import heightmap as hmod
from vrenderer_tpu.camera import flythrough, Camera

WIDTH, HEIGHT = 1920, 1152


def main():
    n = 64
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("n="):
            n = int(a[2:])
        elif a.startswith("reps="):
            reps = int(a[5:])

    cfg = FrameConfig(width=WIDTH, height=HEIGHT,
                      terrain=TerrainSettings(max_instances=1024))
    hm = hmod.procedural_heightmap(256)
    alb = hmod.procedural_albedo(hm)
    r = Renderer(cfg, hm, alb, raster_backend="pallas", interpret=False,
                 max_work=2048, max_active=512)
    params = FrameParams.default()
    cams = flythrough(64, heightmap=hm, max_height=400.0)

    def frame(eye, tgt, up):
        cam = Camera(eye=eye, target=tgt, up=up)
        out = r._frame_impl(cam, params, None)
        return out.ldr.mean() + out.depth.mean()

    def chain(m):
        def run(eye, tgt, up):
            def body(i, acc):
                return acc + frame(eye + acc * 1e-30, tgt, up)
            return jax.lax.fori_loop(0, m, body, jnp.float32(0.0))
        return jax.jit(run)

    c4, c12 = chain(4), chain(12)

    def t_once(f, i):
        t0 = time.perf_counter()
        float(f(cams.eye[i], cams.target[i], cams.up[i]))
        return time.perf_counter() - t0

    # compile once
    t_once(c4, 0)
    t_once(c12, 0)

    # workload stats per camera (one jitted stats fn; fetch scalars)
    from vrenderer_tpu.terrain import quadtree
    from vrenderer_tpu.ops import shadow, vertex
    from vrenderer_tpu.utils import math3d
    from vrenderer_tpu.ops import raster_pallas as rp
    from vrenderer_tpu.camera import make_view_constants

    ts = cfg.terrain

    @jax.jit
    def stats(eye, tgt, up):
        cam = Camera(eye=eye, target=tgt, up=up)
        vc = make_view_constants(cam, cfg.width, cfg.height,
                                 cfg.vfov_degrees, cfg.z_near, cfg.z_far)
        shadow_field = shadow.horizon_shadow_field(
            hm, params.max_height, float(ts.world_size),
            params.light_direction)
        planes = math3d.frustum_planes(vc["world_to_clip"])
        inst = quadtree.select_all_surfaces(
            ts, vc["camera_pos"], planes, ts.lod_ranges())
        inst = r._clip_active(inst)
        vout = vertex.vertex_stage(ts, inst, vc["camera_pos"], hm, alb,
                                   shadow_field, params.max_height,
                                   ts.lod_ranges(), nrm_field=r._nrm_field)
        packed, bbox, usable, dist = r._packed_geometry(
            vout.world, vout.attrs, inst.valid, vc["world_to_clip"],
            cfg.width, cfg.height)
        work = rp.build_work_list(
            bbox, usable, cfg.width, cfg.height, tile=cfg.raster.tile_w,
            tris_per_inst=ts.tris_per_instance, max_work=2048,
            order_key=dist, packed=packed, sub_h=cfg.raster.subtile_h,
            compact_k=cfg.raster.compact_k, win_w=cfg.raster.win_w)
        n_inst = jnp.minimum(inst.count, ts.max_instances)
        n_items = jnp.minimum(work.num_items, 2048)
        rounds = work.sub_rounds.sum()
        valid_t = packed.tri_cols[:, 4].sum()
        return n_inst, n_items, rounds, valid_t

    rows = []
    for i in range(n):
        t4 = min(t_once(c4, i) for _ in range(reps))
        t12 = min(t_once(c12, i) for _ in range(reps))
        ms = (t12 - t4) / 8 * 1000
        st = [int(np.asarray(v)) for v in stats(
            cams.eye[i], cams.target[i], cams.up[i])]
        rows.append((i, ms, *st))
        print(f"cam {i:2d}: {ms:7.2f} ms  inst {st[0]:4d} items {st[1]:4d} "
              f"rounds {st[2]:6d} tris {st[3]:7d}", flush=True)

    arr = np.asarray([r_[1:] for r_ in rows], np.float64)
    ms_v = arr[:, 0]
    print(f"\nmean {ms_v.mean():.2f} ms ({1000/ms_v.mean():.2f} FPS), "
          f"min {ms_v.min():.2f} (cam {int(np.argmin(ms_v))}), "
          f"max {ms_v.max():.2f} (cam {int(np.argmax(ms_v))}), "
          f"p90 {np.percentile(ms_v, 90):.2f}")
    names = ["instances", "work items", "rounds", "valid tris"]
    for j, nm in enumerate(names):
        c = np.corrcoef(ms_v, arr[:, 1 + j])[0, 1]
        print(f"corr(ms, {nm}) = {c:+.3f}")
    # simple least-squares on rounds: ms ~ a*rounds + b
    A = np.stack([arr[:, 3], np.ones_like(ms_v)], axis=1)
    coef, *_ = np.linalg.lstsq(A, ms_v, rcond=None)
    pred = A @ coef
    resid = ms_v - pred
    print(f"fit: ms = {coef[0]*1e3:.3f} us/round x rounds + {coef[1]:.2f}; "
          f"max |resid| {np.abs(resid).max():.2f} ms "
          f"(cam {int(np.argmax(np.abs(resid)))})")


if __name__ == "__main__":
    main()
