"""Deferred lighting, tonemapping, and the procedural sky.

Image-space passes over HBM-resident buffers — pure elementwise XLA,
fused by the compiler into a handful of HBM sweeps.

* ``deferred_lighting`` mirrors donut's DeferredLightingPass as driven by
  the reference (Renderer.cpp:417-428): one directional light with a
  shadow term, plus a hemispherical ambient split where
  ambientBottom = ambientTop * (0.3, 0.4, 0.3) (Renderer.cpp:422-423).
  The terrain G-buffer carries specular f0 = 0.01 and roughness = 1.0
  (terrain_ps.hlsl:76-79), so the GGX specular lobe is present but
  visually tiny, as in the reference.
* ``tonemap`` stands in for donut's ToneMappingPass::SimpleRender
  (Renderer.cpp:431): exposure + an invertible filmic curve (Reinhard
  luminance by default; ACES-fitted optional), returning *linear* LDR.
* ``sky`` reproduces the reference's pass-order quirk: the procedural sky
  is rendered AFTER tonemapping, straight into the LDR target with a
  depth test (Renderer.cpp:430-439), so sky colors bypass the tonemapper.
* ``srgb_encode`` is the LdrColor SRGBA8 target's hardware sRGB
  conversion (RenderTargets, Renderer.h:50-110).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vrenderer_tpu.utils import math3d


def ambient_color(normal_y: jnp.ndarray, ambient_top: jnp.ndarray) -> jnp.ndarray:
    """Hemisphere ambient: lerp(bottom, top, n.y * 0.5 + 0.5) with
    bottom = top * (0.3, 0.4, 0.3) (Renderer.cpp:422-423)."""
    top = jnp.broadcast_to(
        jnp.asarray(ambient_top, jnp.float32), normal_y.shape + (3,)
    ) * jnp.ones((3,), jnp.float32)
    bottom = top * jnp.asarray([0.3, 0.4, 0.3], jnp.float32)
    t = (normal_y * 0.5 + 0.5)[..., None]
    return bottom * (1.0 - t) + top * t


def deferred_lighting(
    albedo: jnp.ndarray,        # (H, W, 3)
    normal: jnp.ndarray,        # (H, W, 3)
    shadow: jnp.ndarray,        # (H, W) in [0, 1]
    covered: jnp.ndarray,       # (H, W) bool
    view_dir: jnp.ndarray,      # (H, W, 3) unit, surface -> eye
    light_direction: jnp.ndarray,  # (3,) travel direction
    light_irradiance: jnp.ndarray,  # scalar
    light_color: jnp.ndarray,   # (3,)
    ambient_top: jnp.ndarray,   # scalar
    specular_f0: float = 0.01,
    roughness: float = 1.0,
) -> jnp.ndarray:
    """HDR color (H, W, 3); background pixels are 0 (cleared HdrColor)."""
    n = math3d.normalize(normal)
    l = -jnp.asarray(light_direction, jnp.float32)
    l = l / jnp.sqrt(jnp.sum(l * l) + 1e-20)
    ndotl = jnp.clip(jnp.sum(n * l, axis=-1), 0.0, 1.0)

    radiance = (
        jnp.asarray(light_color, jnp.float32)
        * light_irradiance
        * (ndotl * shadow)[..., None]
    )
    diffuse = albedo * (radiance + ambient_color(n[..., 1], ambient_top))

    # GGX specular (Schlick fresnel, Smith-approx visibility)
    h = math3d.normalize(l + view_dir)
    ndoth = jnp.clip(jnp.sum(n * h, axis=-1), 0.0, 1.0)
    ndotv = jnp.clip(jnp.sum(n * view_dir, axis=-1), 1e-4, 1.0)
    a2 = roughness ** 4
    d = a2 / jnp.maximum(jnp.pi * (ndoth * ndoth * (a2 - 1.0) + 1.0) ** 2, 1e-6)
    vis = 0.25 / jnp.maximum(
        (ndotv + jnp.sqrt(a2 + (1 - a2) * ndotv * ndotv))
        * (ndotl + jnp.sqrt(a2 + (1 - a2) * ndotl * ndotl)),
        1e-4,
    )
    vdoth = jnp.clip(jnp.sum(view_dir * h, axis=-1), 0.0, 1.0)
    fresnel = specular_f0 + (1.0 - specular_f0) * (1.0 - vdoth) ** 5
    spec = (d * vis * fresnel * ndotl * shadow * light_irradiance)[..., None]

    hdr = diffuse + spec * jnp.asarray(light_color, jnp.float32)
    return jnp.where(covered[..., None], hdr, 0.0)


def tonemap(
    hdr: jnp.ndarray, exposure: jnp.ndarray = 1.0, operator: str = "reinhard"
) -> jnp.ndarray:
    """HDR -> linear LDR in [0, 1]."""
    c = hdr * exposure
    if operator == "clamp":
        return jnp.clip(c, 0.0, 1.0)
    if operator == "aces":
        a, b, cc, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
        return jnp.clip((c * (a * c + b)) / (c * (cc * c + d) + e), 0.0, 1.0)
    # luminance-based Reinhard (default)
    lum = jnp.maximum(
        0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2], 1e-6
    )
    scale = (lum / (1.0 + lum)) / lum
    return jnp.clip(c * scale[..., None], 0.0, 1.0)


def adapt_exposure(
    hdr: jnp.ndarray,              # (H, W, 3) linear HDR
    covered: jnp.ndarray,          # (H, W) bool (background excluded)
    adapted_lum: jnp.ndarray,      # () previous adapted luminance
    dt: jnp.ndarray,               # seconds since last frame
    speed_up: float = 1.0,
    speed_down: float = 1.0,
    min_lum: float = 0.02,
    max_lum: float = 4.0,
    middle_grey: float = 0.5,
    axis_name=None,
):
    """Eye adaptation: (new_adapted_lum, exposure_scale).

    The reference advances donut's ToneMappingPass each frame
    (``m_ToneMappingPass->AdvanceFrame(seconds)``, Renderer.cpp:188-189),
    which EMA-tracks the frame's average log luminance at
    eyeAdaptationSpeedUp/Down and exposes middleGrey/adaptedLum.
    Histogram-free TPU version: geometric-mean luminance of covered
    pixels (one fused reduction), exponential approach with separate
    up/down rates, clamped adapted range. Pure function of traced
    values — jit-carryable across frames.
    """
    lum = (
        0.2126 * hdr[..., 0] + 0.7152 * hdr[..., 1] + 0.0722 * hdr[..., 2]
    )
    logl = jnp.log2(jnp.maximum(lum, 1e-6))
    n_cov = jnp.sum(covered.astype(jnp.float32))
    s_log = jnp.sum(jnp.where(covered, logl, 0.0))
    if axis_name is not None:
        # screen-band sharding: the adaptation target is a whole-frame
        # statistic, so band partial sums combine over the mesh axis
        n_cov = jax.lax.psum(n_cov, axis_name)
        s_log = jax.lax.psum(s_log, axis_name)
    target = jnp.exp2(s_log / jnp.maximum(n_cov, 1.0))
    target = jnp.clip(target, min_lum, max_lum)
    speed = jnp.where(target > adapted_lum, speed_up, speed_down)
    blend = 1.0 - jnp.exp(-dt * speed)
    new_lum = adapted_lum + (target - adapted_lum) * blend
    new_lum = jnp.clip(new_lum, min_lum, max_lum)
    return new_lum, middle_grey / new_lum


def srgb_encode(linear: jnp.ndarray) -> jnp.ndarray:
    l = jnp.clip(linear, 0.0, 1.0)
    return jnp.where(
        l <= 0.0031308, l * 12.92, 1.055 * jnp.power(l, 1.0 / 2.4) - 0.055
    )


def sky_color(
    view_dir_world: jnp.ndarray,   # (..., 3) unit, eye -> pixel
    light_direction: jnp.ndarray,  # (3,)
    angular_size_degrees: jnp.ndarray = 0.53,
) -> jnp.ndarray:
    """Procedural sky in the spirit of donut's SkyPass (horizon/zenith
    gradient + sun disc with the light's angular size, Renderer.cpp:437,
    angularSize Renderer.cpp:136)."""
    d = math3d.normalize(view_dir_world)
    sun = -jnp.asarray(light_direction, jnp.float32)
    sun = sun / jnp.sqrt(jnp.sum(sun * sun) + 1e-20)

    elev = d[..., 1]
    zenith = jnp.asarray([0.25, 0.45, 0.82], jnp.float32)
    horizon = jnp.asarray([0.75, 0.82, 0.92], jnp.float32)
    ground = jnp.asarray([0.28, 0.25, 0.22], jnp.float32)
    t = jnp.clip(elev, 0.0, 1.0) ** 0.5
    above = horizon * (1.0 - t[..., None]) + zenith * t[..., None]
    below = jnp.clip(-elev * 8.0, 0.0, 1.0)[..., None]
    base = above * (1.0 - below) + ground * below

    cosang = jnp.sum(d * sun, axis=-1)
    cos_disc = jnp.cos(jnp.deg2rad(angular_size_degrees) * 0.5)
    disc = jnp.clip((cosang - cos_disc) / jnp.maximum(1.0 - cos_disc, 1e-6), 0.0, 1.0)
    glow = jnp.clip(cosang, 0.0, 1.0) ** 64 * 0.35
    sun_vis = jnp.clip(sun[1] * 10.0 + 0.5, 0.0, 1.0)  # fade at sunset
    return base + (disc * 4.0 + glow)[..., None] * sun_vis
