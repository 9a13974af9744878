"""Design-space statistics for the transposed-eval rasterizer (round 4).

For the real 1080p flythrough workload, model — from the work-list
builder's exact per-cell counts — the cost terms of the transposed
design (pixels on sublanes, K triangles on lanes, per-(item, subtile)
16-px-quantized x-ranges) against the current kernel (K=32 rows, full
2048-px subtile sweeps):

  eval px-slots   = sum over (item, subtile): ceil(c / K) * K * Pw
                    where Pw = x-range-px * sub_h (transposed) or
                    sub_h * 128 (current)
  compaction work = rounds * K * T * 48 MACs (3 bf16 one-hot dots)
  lane util       = live tris / (rounds * K)

Throwaway measurement tooling (CPU ok — the builder is XLA).
Usage: python scripts/stat_transposed.py [n_frames]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from vrenderer_tpu.config import FrameConfig, TerrainSettings  # noqa: E402
from vrenderer_tpu.renderer import Renderer, FrameParams  # noqa: E402
from vrenderer_tpu.terrain import heightmap as hmod, quadtree  # noqa: E402
from vrenderer_tpu.camera import flythrough, Camera, make_view_constants  # noqa: E402
from vrenderer_tpu.ops import raster_pallas as rp  # noqa: E402
from vrenderer_tpu.ops import vertex as vmod  # noqa: E402
from vrenderer_tpu.utils import math3d  # noqa: E402

WIDTH, HEIGHT = 1920, 1152
MAX_WORK = 2048
SUB_H = 16


def frame_counts(r, cfg, params, eye, target, up):
    """Exact per-(work item, subtile-row) counts + per-16px-window
    occupancy for one camera, via the production builder (compact_k=1
    makes sub_rounds the raw counts)."""
    ts = cfg.terrain
    cam = Camera(eye=eye, target=target, up=up)
    vc = make_view_constants(cam, cfg.width, cfg.height, cfg.vfov_degrees,
                             cfg.z_near, cfg.z_far)
    planes = math3d.frustum_planes(vc["world_to_clip"])
    inst = quadtree.select_all_surfaces(ts, eye, planes, ts.lod_ranges())
    inst = r._clip_active(inst)
    sf = jnp.ones_like(r.heightmap)
    vo = vmod.vertex_stage(ts, inst, eye, r.heightmap, r.albedo, sf,
                           params.max_height, ts.lod_ranges(),
                           nrm_field=r._nrm_field)
    pk, bb, us, dd = r._packed_geometry(
        vo.world, vo.attrs, inst.valid, vc["world_to_clip"],
        cfg.width, cfg.height)
    wk128 = rp.build_work_list(
        bb, us, cfg.width, cfg.height, tile=128,
        tris_per_inst=ts.tris_per_instance, max_work=MAX_WORK,
        order_key=dd, packed=pk, sub_h=SUB_H, compact_k=1, win_w=128)
    wk16 = rp.build_work_list(
        bb, us, cfg.width, cfg.height, tile=128,
        tris_per_inst=ts.tris_per_instance, max_work=MAX_WORK,
        order_key=dd, packed=pk, sub_h=SUB_H, compact_k=1, win_w=16)
    c128 = np.asarray(wk128.sub_rounds)        # (n_sub, W) counts
    c16 = np.asarray(wk16.sub_rounds)          # (n_sub*8, W)
    n_sub = 128 // SUB_H
    c16 = c16.reshape(n_sub, 8, -1)            # (n_sub, 8 win, W)
    return c128, c16


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    ts = TerrainSettings(max_instances=1024)
    cfg = FrameConfig(width=WIDTH, height=HEIGHT, terrain=ts)
    hm = hmod.procedural_heightmap(256)
    alb = hmod.procedural_albedo(hm)
    r = Renderer(cfg, hm, alb, raster_backend="xla", max_work=MAX_WORK,
                 max_active=512)
    params = FrameParams.default()
    cams = flythrough(64, heightmap=hm, max_height=400.0)

    all_counts = []          # per-cell live-tri counts (nonzero cells)
    all_ranges16 = []        # per-cell x-extent in px (16px-quantized)
    all_wcounts = []         # per-cell per-16px-window counts (N, 8)
    for i in range(0, 64, max(1, 64 // n_frames)):
        c128, c16 = frame_counts(r, cfg, params, cams.eye[i],
                                 cams.target[i], cams.up[i])
        nz = c128 > 0
        all_counts.append(c128[nz])
        occ = c16 > 0                       # (n_sub, 8, W)
        win_idx = np.arange(8)[None, :, None]
        first = np.where(occ, win_idx, 8).min(axis=1)    # (n_sub, W)
        last = np.where(occ, win_idx, -1).max(axis=1)
        rng = np.where(nz, (last - first + 1) * 16, 0)
        all_ranges16.append(rng[nz])
        all_wcounts.append(np.moveaxis(c16, 1, 2)[nz])   # (N, 8)
        print(f"frame {i}: cells={nz.sum()} tris={c128[nz].sum()}",
              flush=True)

    c = np.concatenate(all_counts).astype(np.int64)
    rng = np.concatenate(all_ranges16).astype(np.int64)
    print(f"\ncells (item,subtile) with tris: {len(c)}, live tris {c.sum()}")
    print("count percentiles", np.percentile(c, [10, 50, 90, 99]).round(1),
          "mean", round(c.mean(), 1), "max", c.max())
    print("x-range px percentiles",
          np.percentile(rng, [10, 50, 90, 99]).round(1),
          "mean", round(rng.mean(), 1))

    T, CH = 2048, 48
    cur_rounds = np.ceil(c / 32).sum()
    cur_slots = (np.ceil(c / 32) * 32).sum()
    cur_eval = cur_slots * (SUB_H * 128)
    cur_mxu = cur_rounds * 32 * T * CH * 3
    print(f"\ncurrent K=32 full-width: rounds {cur_rounds:.0f} "
          f"slots {cur_slots:.0f} eval-px {cur_eval/1e6:.0f}M "
          f"compact-MACs {cur_mxu/1e9:.1f}G")

    for K in (32, 64, 128):
        for q in (16, 32, 64):
            rq = np.ceil(rng / q) * q
            rounds = np.ceil(c / K)
            slots = rounds * K
            evalpx = (slots * rq * SUB_H).sum()
            mxu = rounds.sum() * K * T * CH * 3
            util = c.sum() / slots.sum()
            print(f"transposed K={K:3d} win_q={q:3d}px: "
                  f"rounds {rounds.sum():8.0f} util {util:.2f} "
                  f"eval-px {evalpx/1e6:6.0f}M ({cur_eval/evalpx:4.1f}x) "
                  f"compact-MACs {mxu/1e9:5.1f}G "
                  f"({mxu/max(cur_mxu,1):.1f}x cur)")

    # PER-ROUND windows (rank-segmented): compacted rank order follows
    # triangle index order, which sweeps x within each grid row — round r
    # (ranks [rK, (r+1)K)) spans only the 16-px windows whose cumulative
    # count intersects that rank interval. Estimated from the per-window
    # counts (straddlers counted in both windows -> slightly pessimistic
    # windows, slightly optimistic counts).
    wc = np.concatenate(all_wcounts).astype(np.int64)      # (N, 8)
    cum = np.cumsum(wc, axis=1)                            # inclusive
    cum0 = np.concatenate([np.zeros((len(wc), 1), np.int64),
                           cum[:, :-1]], axis=1)           # exclusive
    for K in (32, 64, 128):
        max_r = int(np.ceil(c.max() / K))
        total = cum[:, -1]
        rounds_n = np.ceil(total / K).astype(np.int64)
        ev = 0
        for r in range(max_r):
            lo, hi = r * K, (r + 1) * K
            live = rounds_n > r
            # windows overlapping rank interval [lo, min(hi, total))
            wlive = (cum0 < np.minimum(hi, total)[:, None]) & (cum > lo)
            first = np.where(wlive, np.arange(8)[None], 8).min(axis=1)
            last = np.where(wlive, np.arange(8)[None], -1).max(axis=1)
            span = np.where(live, (last - first + 1) * 16, 0)
            ev += (span * K * SUB_H).sum()
        mxu = rounds_n.sum() * K * T * CH * 3
        print(f"per-round  K={K:3d} win_q=16px:  "
              f"rounds {rounds_n.sum():8.0f} "
              f"eval-px {ev/1e6:6.0f}M ({cur_eval/ev:4.1f}x) "
              f"compact-MACs {mxu/1e9:5.1f}G ({mxu/max(cur_mxu,1):.1f}x)")


if __name__ == "__main__":
    main()
