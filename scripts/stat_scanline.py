"""Scanline/interval rasterizer feasibility numbers (VERDICT r3 #8).

The scanline design replaces the per-(item, subtile) dense sweep
(every touching triangle evaluated over sub_h x 128 px) with per-ROW
triangle x-interval lists. On TPU the intervals cannot be applied as
dynamic lane ranges (Mosaic: lane slices are static), so the cheapest
realizable form is: per (item, row) compact the row's triangles and
evaluate each over the full 128-px row — eval area becomes
sum_t(height_t x 128) instead of sum_t(16 x 128), at the price of
per-ROW compaction rounds (16x the round count of per-subtile).

This script measures the deciding quantities on the real 1080p
flythrough workload: the distribution of per-triangle pixel heights
(the eval saving is 16 / mean_height) and widths, and the implied
round-count multiplier. Throwaway measurement tooling.
Usage: python scripts/stat_scanline.py [n_frames]
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
from vrenderer_tpu.ops import vertex as vmod  # noqa: E402
from vrenderer_tpu.ops import raster_pallas as rp  # noqa: E402
from vrenderer_tpu.utils import math3d  # noqa: E402

WIDTH, HEIGHT = 1920, 1152


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    ts = TerrainSettings(max_instances=1024)
    cfg = FrameConfig(width=WIDTH, height=HEIGHT, terrain=ts)
    hm = hmod.procedural_heightmap(256)
    alb = hmod.procedural_albedo(hm)
    r = Renderer(cfg, hm, alb, raster_backend="xla", max_active=512)
    params = FrameParams.default()
    cams = flythrough(64, heightmap=hm, max_height=400.0)

    hs, ws = [], []
    for i in range(0, 64, max(1, 64 // n_frames)):
        cam = Camera(eye=cams.eye[i], target=cams.target[i], up=cams.up[i])
        vc = make_view_constants(cam, cfg.width, cfg.height,
                                 cfg.vfov_degrees, cfg.z_near, cfg.z_far)
        planes = math3d.frustum_planes(vc["world_to_clip"])
        inst = quadtree.select_all_surfaces(ts, cam.eye, planes,
                                            ts.lod_ranges())
        inst = r._clip_active(inst)
        sf = jnp.ones_like(hm)
        vo = vmod.vertex_stage(ts, inst, cam.eye, hm, alb, sf,
                               params.max_height, ts.lod_ranges(),
                               nrm_field=r._nrm_field)
        pk, bb, us, dd = r._packed_geometry(
            vo.world, vo.attrs, inst.valid, vc["world_to_clip"],
            cfg.width, cfg.height)
        cols = np.asarray(pk.tri_cols)         # (I, 8, T)
        valid = cols[:, 4] > 0.0
        x0 = np.clip(cols[:, 0], 0, WIDTH - 1)
        x1 = np.clip(cols[:, 2], 0, WIDTH - 1)
        y0 = np.clip(cols[:, 1], 0, HEIGHT - 1)
        y1 = np.clip(cols[:, 3], 0, HEIGHT - 1)
        h = (y1 - y0 + 1)[valid]
        w = (x1 - x0 + 1)[valid]
        hs.append(h)
        ws.append(w)
        print(f"frame {i}: tris {valid.sum()}", flush=True)

    h = np.concatenate(hs)
    w = np.concatenate(ws)
    print(f"\nvisible tris: {len(h)}")
    print("tri pixel height percentiles",
          np.percentile(h, [10, 50, 90, 99]).round(1),
          "mean", round(h.mean(), 1))
    print("tri pixel width  percentiles",
          np.percentile(w, [10, 50, 90, 99]).round(1),
          "mean", round(w.mean(), 1))
    # per-subtile sweep evaluates each touching tri over every 16-row
    # subtile its bbox intersects: rows charged = 16 * n_subtiles(tri)
    sub_rows = 16 * (np.floor(y1 / 16) - np.floor(y0 / 16) + 1)[valid]
    print("current charged rows/tri mean", round(sub_rows.mean(), 1),
          "-> scanline eval saving bound",
          round(sub_rows.sum() / h.sum(), 2), "x")
    # and the price: per-row compaction rounds vs per-subtile rounds
    print("round multiplier (rows touched / subtiles touched):",
          round(h.sum() / (sub_rows.sum() / 16), 2), "x")


if __name__ == "__main__":
    main()
