"""Terrain shadowing.

The reference renders a 1-cascade 2048^2 shadow map (depth-only terrain +
scene raster from the sun's ortho view, Renderer.cpp:83-93,333-380) and
PCF-samples it per pixel in deferred lighting. Per-pixel shadow-map
sampling is a gather — two orders of magnitude too slow on TPU — so the
default shadow technique here is TPU-native and mathematically equivalent
for a heightfield occluder set:

**Horizon-map shadows**: march the heightfield toward the sun in texture
space with whole-texture fractional shifts (dense, gather-free), recording
the maximum occluder slope. A texel is lit when the sun's elevation slope
clears that horizon slope; a soft band around the threshold approximates
PCF's penumbra. The result is a world-space shadow-factor field sampled at
terrain vertices (separable matmuls, ops/texture.py) and interpolated by
the rasterizer — the same role the reference's shadow map plays for the
terrain, at the same effective resolution (its 2048 m / 2048 px cascade is
1 m/texel, matching the heightfield's own sampling density).

``render_shadow_depth`` also provides the reference-shaped depth-only
raster pass from the light's view ("Terrain Shadow" counter,
Renderer.cpp:354) built on the same rasterizer, for capability parity and
tests; see renderer.py for how it is wired.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vrenderer_tpu.utils import math3d


def _shift2d(tex: jnp.ndarray, du: jnp.ndarray, dv: jnp.ndarray) -> jnp.ndarray:
    """Shift a (H, W) field by a traced fractional (du, dv) in uv units,
    clamp addressing. Two 2-tap axis blends; row/col takes are contiguous.
    """
    H, W = tex.shape

    def axis_shift(t, d, size, axis):
        s = d * (size - 1)
        i0 = jnp.floor(s).astype(jnp.int32)
        f = s - i0.astype(jnp.float32)
        idx = jnp.arange(size, dtype=jnp.int32)
        a = jnp.take(t, jnp.clip(idx + i0, 0, size - 1), axis=axis)
        b = jnp.take(t, jnp.clip(idx + i0 + 1, 0, size - 1), axis=axis)
        return a * (1.0 - f) + b * f

    out = axis_shift(tex, du, W, 1)
    return axis_shift(out, dv, H, 0)


def horizon_shadow_field(
    heightmap: jnp.ndarray,       # (H, W) in [0, 1]
    max_height: jnp.ndarray,      # scalar, world units
    world_size: float,
    light_direction: jnp.ndarray,  # (3,) direction light TRAVELS (dir.y < 0)
    num_steps: int = 24,
    softness_slope: float = 0.03,
    bias: float = 0.5,
) -> jnp.ndarray:
    """Shadow factor field over the world, (H, W) in [0, 1] (1 = lit).

    For each texel, marches toward the sun (-light_direction) with
    log-spaced world-distance steps from one texel up to half the world,
    tracking max((occluder_height - ray_height) / distance) — the excess
    slope over the sun ray. Lit where the excess is <= 0; a smooth ramp of
    width ``softness_slope`` emulates the reference's PCF penumbra.
    """
    Ht, Wt = heightmap.shape
    sun = -jnp.asarray(light_direction, jnp.float32)
    sun = sun / jnp.sqrt(jnp.sum(sun * sun) + 1e-20)
    horiz = jnp.sqrt(sun[0] ** 2 + sun[2] ** 2)
    # slope of the sun ray per world meter of horizontal travel
    sun_slope = sun[1] / jnp.maximum(horiz, 1e-6)
    dir_u = sun[0] / jnp.maximum(horiz, 1e-6)
    dir_v = sun[2] / jnp.maximum(horiz, 1e-6)

    h_world = heightmap * max_height
    texel = world_size / Wt
    t0 = texel
    t1 = world_size * 0.5
    ratio = (t1 / t0) ** (1.0 / (num_steps - 1))

    excess = jnp.full_like(heightmap, -1e9)
    t = t0
    for _ in range(num_steps):
        du = dir_u * (t / world_size)
        dv = dir_v * (t / world_size)
        occ = _shift2d(h_world, du, dv)
        excess = jnp.maximum(excess, (occ - (h_world + bias)) / t - sun_slope)
        t *= ratio

    lit = 1.0 - jnp.clip(excess / softness_slope + 1.0, 0.0, 1.0)
    # sun at/below the horizon: fully shadowed
    lit = jnp.where(sun[1] <= 0.0, jnp.zeros_like(lit), lit)
    return lit


def light_view_matrices(
    light_direction: jnp.ndarray,  # (3,)
    world_size: float,
    max_height: jnp.ndarray,
    resolution: int,
):
    """Ortho world->clip for the sun, covering the whole terrain.

    The reference's CascadedShadowMap::SetupForPlanarViewStable is driven
    with maxShadowDistance = zRange = WORLD_SIZE (Renderer.cpp:345-348),
    i.e. its single cascade effectively spans the world; this builds the
    equivalent stable whole-world ortho view.
    """
    d = -jnp.asarray(light_direction, jnp.float32)
    d = d / jnp.sqrt(jnp.sum(d * d) + 1e-20)
    center = jnp.zeros(3, jnp.float32)
    eye = center + d * (world_size * 1.5)
    up = jnp.where(
        jnp.abs(d[1]) > 0.99,
        jnp.array([0.0, 0.0, 1.0], jnp.float32),
        jnp.array([0.0, 1.0, 0.0], jnp.float32),
    )
    w2v = math3d.look_at(eye, center, up)
    half = world_size * 0.75
    proj = math3d.ortho_proj_d3d_style(
        -half, half, -half, half, 0.1, world_size * 3.0
    )
    return math3d.view_proj(w2v, proj)
