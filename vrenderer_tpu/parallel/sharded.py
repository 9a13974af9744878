"""Multi-chip frame rendering via jax.sharding + shard_map.

The reference is strictly single-GPU (SURVEY.md §2.4) — this is new
capability, designed TPU-first: a 2D device mesh with

* a ``frame`` axis: data-parallel over a batch of frames (flythrough
  chunks, offline rendering), zero communication;
* a ``tile`` axis: screen-space parallel — each device rasterizes a
  horizontal band of every frame. Geometry (selection, vertex stage,
  triangle setup) is computed replicated (it is a small share of frame
  cost and keeping it replicated avoids an all-gather of triangle data
  over ICI); only the band's raster + image-space passes run sharded.
  The final frame lives sharded over devices and is only gathered if the
  host asks.

There is ONE frame implementation: each band calls
``Renderer._frame_impl(band=(y0, band_h))`` — the same code path as the
single-chip frame (the reference likewise has a single RecordCommand,
Renderer.cpp:321-446) — so scene meshes, both shadow modes, the
render_terrain/debug_quadtree gates, and eye adaptation all behave
identically under sharding. Band rasterization rebases the affine
screen-space coefficients: every edge/interpolation plane
E(x, y) = a x + b y + c becomes E'(x, y') = a x + b y' + (c + b y0) in
the band's local frame — a cheap elementwise rewrite, no re-projection.
Whole-frame statistics (eye adaptation's log-luminance mean) combine
across bands with an ICI psum (ops/lighting.adapt_exposure axis_name).
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

from vrenderer_tpu.camera import Camera
from vrenderer_tpu.ops import raster
from vrenderer_tpu.renderer import Renderer, FrameParams

# back-compat re-export (the band coefficient rebase now lives with the
# triangle setup it rewrites)
shift_setup_y = raster.shift_setup_y


def make_mesh(n_devices: Optional[int] = None, frame_axis: int = 1) -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devs)
    assert n % frame_axis == 0
    import numpy as np

    arr = np.asarray(devs).reshape(frame_axis, n // frame_axis)
    return Mesh(arr, axis_names=("frame", "tile"))


def band_height(renderer: Renderer, mesh: Mesh) -> int:
    cfg = renderer.config
    n_tile = mesh.shape["tile"]
    assert cfg.height % (cfg.raster.tile_h * n_tile) == 0, (
        "height must split into whole supertile rows per device"
    )
    return cfg.height // n_tile


def _sharded_executable(renderer: Renderer, mesh: Mesh, adapting: bool):
    """Build (once) and cache the jitted shard_map frame-batch executable.

    The reference never rebuilds pipeline state per frame (PSO cache,
    TerrainPass.cpp:305-335); likewise the shard_map closure + jit here
    is constructed once per (mesh topology, adaptation mode) and reused —
    per-frame values (cameras, params, adaptation seed, scene transforms)
    enter as traced arguments, so repeated calls hit the jit cache with
    zero retracing."""
    key = (
        tuple(d.id for d in mesh.devices.flat),
        mesh.shape["frame"],
        mesh.shape["tile"],
        adapting,
    )
    cache = renderer.__dict__.setdefault("_sharded_exec_cache", {})
    if key in cache:
        return cache[key]
    band_h = band_height(renderer, mesh)

    def one_band(eye, target, up, y0, carry_lum, params, dt, scene_xf):
        cam = Camera(eye=eye, target=target, up=up)
        if adapting:
            out, new_lum = renderer._frame_impl(
                cam, params, None, adapt=(carry_lum, dt),
                band=(y0, band_h), axis_name="tile", scene_xf=scene_xf,
            )
        else:
            out = renderer._frame_impl(
                cam, params, None, band=(y0, band_h), scene_xf=scene_xf,
            )
            new_lum = carry_lum
        return out.ldr, out.overflow, new_lum

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("frame"), P("frame"), P("frame"), P(), P(), P(), P()),
        out_specs=(P("frame", "tile"), P("frame", "tile"),
                   P("frame", "tile")),
        check_rep=False,
    )
    def sharded(eyes, targets, ups, params, init_lum, dt, scene_xf):
        tile_idx = jax.lax.axis_index("tile")
        y0 = (tile_idx * band_h).astype(jnp.float32)

        def step(carry_lum, args):
            eye, target, up = args
            ldr, ovf, new_lum = one_band(
                eye, target, up, y0, carry_lum, params, dt, scene_xf
            )
            return new_lum, (ldr, ovf[None], new_lum[None])

        _, (ldr, ovf, lum) = jax.lax.scan(
            step, init_lum, (eyes, targets, ups)
        )
        return ldr, ovf, lum

    fn = jax.jit(sharded)
    cache[key] = fn
    return fn


def render_frames_sharded(
    renderer: Renderer,
    cameras: Camera,          # fields with leading (B,) axis
    params: FrameParams,
    mesh: Mesh,
    adapted_lum: Optional[float] = None,
    dt: Optional[float] = None,
    return_aux: bool = False,
):
    """Render a batch of frames over a ('frame', 'tile') mesh.

    Returns LDR frames (B, H, W, 3) sharded P('frame', 'tile') — batch
    over the frame axis, rows over the tile axis.

    adapted_lum + dt: enable eye adaptation — each device chains the
    adapted luminance through ITS chunk of the frame batch (exactly the
    sequential single-chip chain when frame_axis == 1), with the
    whole-frame luminance statistic psum-combined across bands.

    return_aux: also return (overflow (B, n_tile) bool — any band's OR is
    the frame's overflow — and adapted (B, n_tile) float32, columns
    identical when adaptation runs).

    The underlying shard_map executable is cached per (mesh topology,
    adaptation mode): camera values, params, the adaptation seed, and
    scene transforms are all traced arguments, so repeated calls (the
    steady-state frame loop) compile nothing.
    """
    adapting = adapted_lum is not None
    fn = _sharded_executable(renderer, mesh, adapting)
    scene_xf = (
        renderer.scene_transforms if renderer._scene_obj is not None
        else None
    )
    frames, overflow, adapted = fn(
        cameras.eye, cameras.target, cameras.up, params,
        jnp.float32(adapted_lum if adapting else 0.5),
        jnp.float32(dt if adapting else 0.0),
        scene_xf,
    )
    if return_aux:
        return frames, overflow, adapted
    return frames
