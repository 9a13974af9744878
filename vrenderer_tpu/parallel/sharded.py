"""Multi-chip frame rendering via jax.sharding + shard_map.

The reference is strictly single-GPU (SURVEY.md §2.4) — this is new
capability, designed TPU-first: a 2D device mesh with

* a ``frame`` axis: data-parallel over a batch of frames (flythrough
  chunks, offline rendering), zero communication;
* a ``tile`` axis: screen-space parallel — each device rasterizes a
  horizontal band of every frame. Geometry (selection, vertex stage,
  triangle setup) is computed replicated (it is ~1% of frame cost and
  keeping it replicated avoids an all-gather of triangle data over ICI);
  only the band's raster + image-space passes run sharded. The final
  frame lives sharded over devices and is only gathered if the host asks.

Band rasterization reuses the single-chip setup by shifting the affine
screen-space coefficients: every edge/interpolation plane E(x, y) =
a x + b y + c becomes E'(x, y') = a x + b y' + (c + b y0) in the band's
local frame — a cheap elementwise rewrite of the packed triangle data, no
re-projection.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map as _shard_map  # jax >= 0.7 (check_vma kwarg)

    def shard_map(f=None, **kw):
        kw["check_vma"] = kw.pop("check_rep", kw.pop("check_vma", False))
        if f is None:
            return lambda fn: _shard_map(fn, **kw)
        return _shard_map(f, **kw)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from vrenderer_tpu.camera import Camera, make_view_constants
from vrenderer_tpu.ops import lighting, raster, raster_pallas, shadow, vertex
from vrenderer_tpu.renderer import Renderer, FrameParams
from vrenderer_tpu.terrain import quadtree
from vrenderer_tpu.utils import math3d


def shift_setup_y(setup: raster.TriSetup, y0: jnp.ndarray) -> raster.TriSetup:
    """Rebase screen-space affine coefficients to a band at global row y0."""
    edge = setup.edge.at[..., 2].add(setup.edge[..., 1] * y0)
    planes = setup.planes.at[..., 2].add(setup.planes[..., 1] * y0)
    bbox = setup.bbox.at[..., 1].add(-y0)
    bbox = bbox.at[..., 3].add(-y0)
    return raster.TriSetup(edge=edge, planes=planes, bbox=bbox, valid=setup.valid)


def make_mesh(n_devices: Optional[int] = None, frame_axis: int = 1) -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devs)
    assert n % frame_axis == 0
    import numpy as np

    arr = np.asarray(devs).reshape(frame_axis, n // frame_axis)
    return Mesh(arr, axis_names=("frame", "tile"))


def render_frames_sharded(
    renderer: Renderer,
    cameras: Camera,          # fields with leading (B,) axis
    params: FrameParams,
    mesh: Mesh,
):
    """Render a batch of frames over a ('frame', 'tile') mesh.

    Returns LDR frames (B, H, W, 3) sharded P('frame', 'tile') — batch
    over the frame axis, rows over the tile axis.
    """
    cfg = renderer.config
    n_tile = mesh.shape["tile"]
    assert cfg.height % (cfg.raster.tile_h * n_tile) == 0, (
        "height must split into whole supertile rows per device"
    )
    band_h = cfg.height // n_tile

    def render_one_band(eye, target, up, tile_idx):
        cam = Camera(eye=eye, target=target, up=up)
        vc = make_view_constants(
            cam, cfg.width, cfg.height, cfg.vfov_degrees, cfg.z_near, cfg.z_far
        )
        shadow_field = shadow.horizon_shadow_field(
            renderer.heightmap, params.max_height,
            float(cfg.terrain.world_size), params.light_direction,
        )
        ts = cfg.terrain
        planes = math3d.frustum_planes(vc["world_to_clip"])
        instances = quadtree.select_all_surfaces(
            ts, vc["camera_pos"], planes, ts.lod_ranges()
        )
        vout = vertex.vertex_stage(
            ts, instances, vc["camera_pos"], renderer.heightmap,
            renderer.albedo, shadow_field, params.max_height, ts.lod_ranges(),
        )
        setup = raster.setup_triangles(
            vout.world, vout.attrs, instances.valid, renderer.tri_indices,
            vc["world_to_clip"], cfg.width, cfg.height,
        )
        y0 = (tile_idx * band_h).astype(jnp.float32)
        setup_b = shift_setup_y(setup, y0)

        wire_px = 1.0 if cfg.raster.wireframe else 0.0
        if renderer.raster_backend == "xla":
            pw = -(-cfg.width // 128) * 128
            ph = -(-band_h // cfg.raster.subtile_h) * cfg.raster.subtile_h
            z, prim_id, attrs = raster.rasterize_xla(
                setup_b, pw, ph,
                tile=(cfg.raster.subtile_h, 128), batch=cfg.raster.tri_batch,
                reverse_z=cfg.raster.reverse_z, wire_px=wire_px,
            )
            z = z[:band_h, :cfg.width]
            prim_id = prim_id[:band_h, :cfg.width]
            attrs = attrs[:band_h, :cfg.width]
        else:
            packed = raster_pallas.pack_tri_data(
                setup_b, ts.max_instances, ts.tris_per_instance,
                tri_batch=cfg.raster.tri_batch,
            )
            bbox_i, usable, dist = raster_pallas.instance_screen_bbox(
                vout.world, vc["world_to_clip"], cfg.width, cfg.height,
                instances.valid,
            )
            bbox_i = bbox_i.at[:, 1].add(-y0)
            bbox_i = bbox_i.at[:, 3].add(-y0)
            work = raster_pallas.build_work_list(
                bbox_i, usable, cfg.width, band_h,
                tile=cfg.raster.tile_w,
                tris_per_inst=ts.tris_per_instance,
                max_work=renderer.max_work,
                order_key=dist,
                packed=packed,
                sub_h=cfg.raster.subtile_h,
                compact_k=cfg.raster.compact_k,
            )
            z, prim_id, attrs, _ = raster_pallas.rasterize_pallas(
                packed, work, cfg.width, band_h,
                tile=cfg.raster.tile_w, sub_h=cfg.raster.subtile_h,
                compact_k=cfg.raster.compact_k,
                max_work=renderer.max_work,
                reverse_z=cfg.raster.reverse_z, wire_px=wire_px,
                interpret=renderer.interpret,
            )
        covered = prim_id >= 0

        # band view rays
        x = (jnp.arange(cfg.width, dtype=jnp.float32) + 0.5) / cfg.width
        yg = (jnp.arange(band_h, dtype=jnp.float32) + 0.5 + y0) / cfg.height
        ndc_x = x * 2.0 - 1.0
        ndc_y = 1.0 - yg * 2.0
        xx, yy = jnp.meshgrid(ndc_x, ndc_y, indexing="xy")
        clip = jnp.stack([xx, yy, jnp.ones_like(xx), jnp.ones_like(xx)], -1)
        # HIGHEST: bf16 unprojection NaNs on hardware (see renderer.py)
        wpos = jnp.matmul(
            clip, vc["clip_to_world"], precision=jax.lax.Precision.HIGHEST
        )
        rays = math3d.normalize(
            wpos[..., :3] / wpos[..., 3:4] - vc["camera_pos"]
        )

        hdr = lighting.deferred_lighting(
            attrs[..., vertex.ATTR_ALBEDO], attrs[..., vertex.ATTR_NORMAL],
            jnp.clip(attrs[..., vertex.ATTR_SHADOW], 0.0, 1.0), covered,
            -rays, params.light_direction, params.light_irradiance,
            params.light_color, params.ambient_intensity,
        )
        ldr_linear = lighting.tonemap(hdr, params.exposure)
        sky = lighting.sky_color(rays, params.light_direction)
        ldr_linear = jnp.where(covered[..., None], ldr_linear, sky)
        return lighting.srgb_encode(ldr_linear)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("frame"), P("frame"), P("frame")),
        out_specs=P("frame", "tile"),
        check_rep=False,
    )
    def sharded(eyes, targets, ups):
        tile_idx = jax.lax.axis_index("tile")

        def one(args):
            eye, target, up = args
            return render_one_band(eye, target, up, tile_idx)

        return jax.lax.map(one, (eyes, targets, ups))

    return sharded(cameras.eye, cameras.target, cameras.up)
