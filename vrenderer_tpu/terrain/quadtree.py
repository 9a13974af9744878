"""Vectorized CDLOD quadtree: fixed-shape, fully jittable LOD selection.

The reference walks a fully materialized pointer quadtree recursively each
frame (QuadTree::NodeSelect, QuadTree.cpp:80-131) — ~5.6M heap nodes for a
2048 surface. Here the tree is implicit: a node is (depth, cell_x, cell_z)
with analytic position/extents, and selection is a level-synchronous masked
sweep.

The key structural fact that makes this fixed-shape: the CDLOD range of a
level, measured in that level's node widths, is constant —
range[lod] / node_width(depth) = (4 * 2^lod) / (surface / 2^depth) =
4 * 2^num_lods / surface = 4 for a 2048 surface with 11 LODs
(QuadTree.cpp:234-241 + node halving). A node can only be visited if its
parent is within range[lod+1] of the camera, i.e. within ~4 parent widths,
so at EVERY depth the reachable cells live in a small window around the
camera cell. A 16x16-node window per level provably covers the reachable
set; everything outside it is unreachable.

Selection therefore runs on [num_levels, 16, 16] arrays:
  visited(d)  = parent visited & parent in range[l+1] & parent in frustum
                & parent in range[l]          (the recursion predicate,
                                               QuadTree.cpp:120)
  selected(d) = visited & in_range[l] & in_frustum & (l==0 | !in_range[l-1])
                                               (self-selected,
                                                QuadTree.cpp:105-117)
              | visited & !in_range[l] & d>0   (emitted by parent when the
                                                child's NodeSelect returns
                                                false, QuadTree.cpp:122-126;
                                                note: NOT frustum tested,
                                                exactly like the reference)
Frustum-culled visited nodes return "handled" without selection
(QuadTree.cpp:99-103), which the formulas above reproduce: a culled node
is neither self-selected nor recursed into, but also not re-emitted by its
parent.

Because the reference never finishes its async min/max height fitting
(m_HeightLoaded stays false; QuadTree.cpp:46-51 commented out), node AABBs
for the frustum test use y in [0, camera.y] (QuadTree.cpp:93-96). That
quirk is reproduced (and is required for oracle parity).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from vrenderer_tpu.config import TerrainSettings
from vrenderer_tpu.utils import math3d


class SelectedInstances(NamedTuple):
    """Packed selection result: the TPU analog of the reference's
    InstanceData array (TerrainPass.cpp:234-256). Fixed size
    max_instances, mask-padded (the reference also always uploads the full
    4096-entry buffer, TerrainPass.cpp:188)."""

    position: jnp.ndarray  # (cap, 3) node center (y = 0)
    extents: jnp.ndarray   # (cap, 3) node extents (y = 0)
    lod: jnp.ndarray       # (cap,) int32 lod level of the node
    valid: jnp.ndarray     # (cap,) bool
    count: jnp.ndarray     # () int32 — total selected (may exceed cap)


class SelectionDebug(NamedTuple):
    """Debug parity with the reference's m_DebugDrawData (QuadTree.h:122-126):
    per-level masks over the selection windows."""

    selected: jnp.ndarray  # (L+1, w, w) bool
    culled: jnp.ndarray    # (L+1, w, w) bool — visited but frustum-culled
    origin: jnp.ndarray    # (L+1, 2) int32 window origin (cell coords)


def _level_cells(settings: TerrainSettings, depth: int):
    return 1 << depth


def select_nodes(
    settings: TerrainSettings,
    camera_pos: jnp.ndarray,       # (3,)
    frustum_planes: jnp.ndarray,   # (6, 4)
    lod_ranges: jnp.ndarray,       # (max_lods,)
    surface_location: jnp.ndarray | None = None,  # (3,) quadtree center
) -> tuple[SelectedInstances, SelectionDebug]:
    """Run CDLOD selection for one quadtree surface.

    Mirrors TerrainPass::Render's per-frame selection
    (TerrainPass.cpp:176-186): clear, NodeSelect from the root at
    lodLevel = num_lods, pack instances.
    """
    W = float(settings.surface_size)
    L = settings.num_lods           # root lodLevel (leaf = 0)
    w = settings.select_window
    loc = (
        jnp.zeros(3, jnp.float32)
        if surface_location is None
        else jnp.asarray(surface_location, jnp.float32)
    )
    cam = jnp.asarray(camera_pos, jnp.float32)
    r2 = lod_ranges * lod_ranges   # reference passes range^2 (QuadTree.cpp:82)

    ii = jnp.arange(w, dtype=jnp.int32)
    cz, cx = jnp.meshgrid(ii, ii, indexing="ij")  # window-local cell coords

    sel_masks = []
    cull_masks = []
    origins = []
    positions = []
    extents_l = []

    visited_prev = None  # (w, w) of previous (coarser) depth
    recurse_prev = None
    origin_prev = None

    for d in range(L + 1):
        lod = L - d
        n = _level_cells(settings, d)
        cell = W / n
        half = cell * 0.5

        # window origin: centered on the camera cell, clamped to the grid
        cam_cell_x = jnp.floor((cam[0] - loc[0] + W * 0.5) / cell).astype(jnp.int32)
        cam_cell_z = jnp.floor((cam[2] - loc[2] + W * 0.5) / cell).astype(jnp.int32)
        ox = jnp.clip(cam_cell_x - w // 2, 0, max(0, n - w))
        oz = jnp.clip(cam_cell_z - w // 2, 0, max(0, n - w))
        origin = jnp.stack([ox, oz])

        gx = ox + cx  # global cell coords (w, w)
        gz = oz + cz
        in_grid = (gx < n) & (gz < n)

        px = loc[0] - W * 0.5 + (gx.astype(jnp.float32) + 0.5) * cell
        pz = loc[2] - W * 0.5 + (gz.astype(jnp.float32) + 0.5) * cell
        bmin = jnp.stack([px - half, jnp.zeros_like(px), pz - half], axis=-1)
        bmax = jnp.stack([px + half, jnp.full_like(px, cam[1]), pz + half], axis=-1)

        d2 = math3d.aabb_dist2_xz(cam, bmin, bmax)
        in_range_self = (d2 <= r2[lod]) & in_grid
        in_frustum = math3d.frustum_intersects_box(frustum_planes, bmin, bmax)

        if d == 0:
            visited = in_grid  # root is always visited (n may be 1)
        else:
            # map to parent window cells
            pgx = gx >> 1
            pgz = gz >> 1
            pwx = pgx - origin_prev[0]
            pwz = pgz - origin_prev[1]
            ok = (pwx >= 0) & (pwx < w) & (pwz >= 0) & (pwz < w)
            pwx = jnp.clip(pwx, 0, w - 1)
            pwz = jnp.clip(pwz, 0, w - 1)
            visited = recurse_prev[pwz, pwx] & ok & in_grid

        if lod > 0:
            in_range_finer = (d2 <= r2[lod - 1]) & in_grid
            self_sel = visited & in_range_self & in_frustum & (~in_range_finer)
            recurse = visited & in_range_self & in_frustum & in_range_finer
        else:
            self_sel = visited & in_range_self & in_frustum
            recurse = jnp.zeros_like(visited)

        if d == 0:
            emitted = jnp.zeros_like(visited)
        else:
            emitted = visited & (~in_range_self)

        selected = self_sel | emitted
        culled = visited & in_range_self & (~in_frustum)

        sel_masks.append(selected)
        cull_masks.append(culled)
        origins.append(origin)
        positions.append(jnp.stack([px, jnp.zeros_like(px), pz], axis=-1))
        extents_l.append(
            jnp.stack([jnp.full_like(px, half), jnp.zeros_like(px), jnp.full_like(px, half)], axis=-1)
        )

        visited_prev = visited
        recurse_prev = recurse
        origin_prev = origin

    sel = jnp.stack(sel_masks)            # (L+1, w, w)
    cul = jnp.stack(cull_masks)
    org = jnp.stack(origins)
    pos = jnp.stack(positions)            # (L+1, w, w, 3)
    ext = jnp.stack(extents_l)
    lods = (L - jnp.arange(L + 1, dtype=jnp.int32))[:, None, None]
    lods = jnp.broadcast_to(lods, sel.shape)

    instances = _pack_instances(settings, sel, pos, ext, lods)
    debug = SelectionDebug(selected=sel, culled=cul, origin=org)
    return instances, debug


def _pack_instances(
    settings: TerrainSettings,
    sel: jnp.ndarray,   # (L+1, w, w) bool
    pos: jnp.ndarray,   # (L+1, w, w, 3)
    ext: jnp.ndarray,   # (L+1, w, w, 3)
    lods: jnp.ndarray,  # (L+1, w, w) int32
) -> SelectedInstances:
    """Compact selected nodes into a fixed-cap instance array.

    Level-major order (coarse -> fine, row-major within a level); the
    reference's DFS order differs but ordering only affects id-buffer tie
    colors, not the rendered image. ~3k candidates -> tiny scatter.
    """
    cap = settings.max_instances
    m = sel.reshape(-1)
    idx = jnp.cumsum(m.astype(jnp.int32)) - 1
    count = jnp.sum(m.astype(jnp.int32))
    target = jnp.where(m & (idx < cap), idx, cap)  # cap row = dropped

    def compact(x):
        flat = x.reshape(m.shape[0], -1)
        out = jnp.zeros((cap + 1, flat.shape[1]), flat.dtype)
        out = out.at[target].set(flat, mode="drop")
        return out[:cap]

    position = compact(pos)
    extents = compact(ext)
    lod = compact(lods[..., None].astype(jnp.int32))[:, 0]
    valid = jnp.arange(cap) < jnp.minimum(count, cap)
    return SelectedInstances(
        position=position, extents=extents, lod=lod, valid=valid, count=count
    )


def single_tile_instances(settings: TerrainSettings) -> SelectedInstances:
    """One root-node instance covering the whole surface — the minimum
    end-to-end slice (BASELINE.md config 1: single flat terrain tile,
    fixed camera, no LOD machinery). Feed to Renderer.render_locked."""
    cap = settings.max_instances
    half = settings.surface_size / 2.0
    position = jnp.zeros((cap, 3), jnp.float32)
    extents = jnp.zeros((cap, 3), jnp.float32)
    extents = extents.at[0, 0].set(half).at[0, 2].set(half)
    lod = jnp.zeros((cap,), jnp.int32).at[0].set(settings.num_lods)
    valid = jnp.zeros((cap,), bool).at[0].set(True)
    return SelectedInstances(
        position=position, extents=extents, lod=lod, valid=valid,
        count=jnp.int32(1),
    )


def select_all_surfaces(
    settings: TerrainSettings,
    camera_pos: jnp.ndarray,
    frustum_planes: jnp.ndarray,
    lod_ranges: jnp.ndarray,
) -> SelectedInstances:
    """Selection over the (world/surface)^2 grid of quadtrees
    (TerrainPass.cpp:97-110), packed into one shared instance array with
    per-tree offsets (TerrainPass.cpp:175-186)."""
    nps = settings.num_surfaces_per_side
    if nps == 1:
        inst, _ = select_nodes(settings, camera_pos, frustum_planes, lod_ranges)
        return inst

    results = []
    for i in range(nps * nps):
        col = i % nps
        row = i // nps
        x = (-0.5 * (nps - 1) + col) * settings.surface_size
        z = (-0.5 * (nps - 1) + row) * settings.surface_size
        loc = jnp.array([x, 0.0, z], jnp.float32)
        inst, _ = select_nodes(
            settings, camera_pos, frustum_planes, lod_ranges, surface_location=loc
        )
        results.append(inst)
    # merge: concatenate valid entries, re-pack to cap
    cap = settings.max_instances
    position = jnp.concatenate([r.position for r in results])
    extents = jnp.concatenate([r.extents for r in results])
    lod = jnp.concatenate([r.lod for r in results])
    valid = jnp.concatenate([r.valid for r in results])
    count = sum(r.count for r in results)
    idx = jnp.cumsum(valid.astype(jnp.int32)) - 1
    target = jnp.where(valid & (idx < cap), idx, cap)
    out_pos = jnp.zeros((cap + 1, 3)).at[target].set(position, mode="drop")[:cap]
    out_ext = jnp.zeros((cap + 1, 3)).at[target].set(extents, mode="drop")[:cap]
    out_lod = jnp.zeros((cap + 1,), jnp.int32).at[target].set(lod, mode="drop")[:cap]
    out_valid = jnp.arange(cap) < jnp.minimum(count, cap)
    return SelectedInstances(out_pos, out_ext, out_lod, out_valid, count)
