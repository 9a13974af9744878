"""Probe (CPU): main-pass work-list size in map-share mode under
different frustum-mask rules for the shared whole-world selection.

The round-4 hardware bench overflowed (3190 items vs 2048) even after
masking the shared selection with the permissive [0, max(cam_y,
max_height)] AABB frustum test: near/behind-camera nodes pass the tall
conservative test, and any node crossing the camera plane (some w<=0
vertices) gets a conservative full-screen bbox from the clipless setup.

Rules probed per flythrough camera, against the unshared main-selection
count:
  permissive: y in [0, max(cam_y, max_height)]          (round-4 fix v1)
  tight:      y in [0, cam_y]   (the selection's own quirk AABB)
  dual:       tight OR (permissive AND fully in front of camera plane)

Measured (4 cameras, 1080p bench scene): permissive keeps 3.0-3.4x the
unshared work (tall boxes beside/behind the camera pass it); tight and
dual reproduce the unshared count EXACTLY — but tight-only could drop a
quirk-EMITTED node (selected without a frustum test, QuadTree.cpp
parent-emits-out-of-range-child) whose above-cam_y peak is visible.
The landed fix (renderer.py map-share branch) therefore re-runs the
~0.02 ms main-frustum selection and masks by exact (x, z, lod) node
MEMBERSHIP — the main pass's instance set is the unshared selection by
construction; only vertex-stage work is shared.

Usage: python scripts/probe_sharemask.py [n_cams]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from vrenderer_tpu.config import FrameConfig, TerrainSettings
from vrenderer_tpu.renderer import Renderer, FrameParams
from vrenderer_tpu.terrain import heightmap as hmod, quadtree
from vrenderer_tpu.camera import flythrough, Camera, make_view_constants
from vrenderer_tpu.ops import shadow, vertex, raster_pallas
from vrenderer_tpu.utils import math3d

W, H = 1920, 1152


def main(n_cams=8):
    cfg = FrameConfig(width=W, height=H,
                      terrain=TerrainSettings(max_instances=1024),
                      shadow_mode="map", shadow_resolution=2048)
    hm = hmod.procedural_heightmap(256)
    alb = hmod.procedural_albedo(hm)
    r = Renderer(cfg, hm, alb, raster_backend="pallas", interpret=True,
                 max_work=8192, max_active=768)
    params = FrameParams.default()
    cams = flythrough(64, heightmap=hm, max_height=400.0)
    ts = cfg.terrain

    def n_work_for(instances, vc):
        geom = vertex.vertex_geometry(
            ts, instances, vc["camera_pos"], hm, params.max_height,
            ts.lod_ranges(),
        )
        vout = vertex.VertexOutput(
            world=geom.world,
            attrs=jnp.zeros(geom.world.shape[:3] + (vertex.NUM_ATTRS,),
                            jnp.float32))
        packed, bbox, usable, dist = r._packed_geometry(
            vout.world, vout.attrs, instances.valid,
            vc["world_to_clip"], W, H)
        work = raster_pallas.build_work_list(
            bbox, usable, W, H, tile=cfg.raster.tile_w,
            tris_per_inst=ts.tris_per_instance, max_work=r.max_work,
            order_key=dist, packed=packed, sub_h=cfg.raster.subtile_h,
            compact_k=cfg.raster.compact_k, win_w=cfg.raster.win_w)
        return int(work.num_items)

    for ci in range(n_cams):
        cam = Camera(eye=cams.eye[ci], target=cams.target[ci],
                     up=cams.up[ci])
        vc = make_view_constants(cam, W, H, cfg.vfov_degrees,
                                 cfg.z_near, cfg.z_far)
        planes_m = math3d.frustum_planes(vc["world_to_clip"])

        # unshared: the main-frustum selection
        inst_main = quadtree.select_all_surfaces(
            ts, vc["camera_pos"], planes_m, ts.lod_ranges())
        inst_main = r._clip_active(inst_main)

        # shared: the light pass's whole-world selection
        wtc_l, *_ = shadow.sun_shear_matrices(
            params.light_direction, float(ts.world_size),
            params.max_height, cfg.shadow_resolution)
        planes_l = math3d.frustum_planes(wtc_l)
        inst_l = quadtree.select_all_surfaces(
            ts, vc["camera_pos"], planes_l, ts.lod_ranges())
        inst_l = r._clip_active(inst_l)

        cam_y = vc["camera_pos"][1]
        bmin = inst_l.position - inst_l.extents
        bmax = inst_l.position + inst_l.extents
        y_hi = jnp.maximum(cam_y, params.max_height)
        perm = math3d.frustum_intersects_box(
            planes_m, bmin, bmax.at[:, 1].set(y_hi))
        tight = math3d.frustum_intersects_box(
            planes_m, bmin, bmax.at[:, 1].set(cam_y))
        # fully in front of the camera plane: every AABB corner has
        # positive view-space z margin (w > z_near in clip terms)
        fwd = vc["view_to_world"][2, :3]  # camera forward (row-vector M)
        eye = vc["camera_pos"]
        # farthest-behind corner along forward
        corn = jnp.where(fwd[None, :] >= 0, bmin, bmax.at[:, 1].set(y_hi))
        d_min = jnp.sum((corn - eye[None, :]) * fwd[None, :], axis=-1)
        in_front = d_min > float(cfg.z_near)
        dual = tight | (perm & in_front)

        def masked(keep):
            return quadtree.SelectedInstances(
                position=inst_l.position, extents=inst_l.extents,
                lod=inst_l.lod, valid=inst_l.valid & keep,
                count=inst_l.count)

        nw_main = n_work_for(inst_main, vc)
        nw_perm = n_work_for(masked(perm), vc)
        nw_tight = n_work_for(masked(tight), vc)
        nw_dual = n_work_for(masked(dual), vc)
        nv = int(inst_l.valid.sum())
        print(f"cam {ci}: light {nv} inst | work: unshared {nw_main}, "
              f"perm {nw_perm}, tight {nw_tight}, dual {nw_dual} | "
              f"kept perm {int((inst_l.valid & perm).sum())}, "
              f"tight {int((inst_l.valid & tight).sum())}, "
              f"dual {int((inst_l.valid & dual).sum())}",
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
