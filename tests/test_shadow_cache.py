"""Static-scene shadow-map cache (map mode, shadow_select="light").

Under the light-eye selection the whole-world sheared shadow map is a
pure function of (sun, max_height, scene transforms, heightmap) — the
camera never enters — so Renderer.shadow_prepass can raster it once and
every frame that reuses it must be BIT-IDENTICAL to the frame that
rasters it inline. The reference cannot cache: its CSM shadow view is
camera-fit per frame (Renderer.cpp:345-348); the whole-world sheared
projection (shadow.sun_shear_matrices) has no camera dependence.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vrenderer_tpu.config import FrameConfig, TerrainSettings
from vrenderer_tpu.camera import Camera
from vrenderer_tpu.renderer import Renderer, FrameParams
from vrenderer_tpu.terrain import heightmap as hmod

CFG = FrameConfig(
    width=256, height=128,
    terrain=TerrainSettings(surface_size=64, world_size=64,
                            max_instances=64, grid_size=8),
    shadow_mode="map", shadow_resolution=128,
    shadow_select="light",
)


def _renderer():
    hm = hmod.procedural_heightmap(64, seed=3)
    alb = hmod.procedural_albedo(hm)
    return Renderer(CFG, hm, alb, raster_backend="xla")


def _cam(i=0):
    return Camera(
        eye=jnp.asarray([3.0 + 2.0 * i, 26.0, 42.0 - 3.0 * i],
                        jnp.float32),
        target=jnp.zeros((3,), jnp.float32),
        up=jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
    )


def test_cached_frame_bit_identical_to_inline():
    r = _renderer()
    params = FrameParams.default()._replace(max_height=jnp.float32(12.0))
    prepass = r.shadow_prepass(params)
    for i in range(3):  # several cameras, one prepass
        inline = r.render(_cam(i), params)
        cached = r.render(_cam(i), params, shadow_prepass=prepass)
        np.testing.assert_array_equal(np.asarray(inline.ldr),
                                      np.asarray(cached.ldr))
        np.testing.assert_array_equal(np.asarray(inline.depth),
                                      np.asarray(cached.depth))
        np.testing.assert_array_equal(np.asarray(inline.prim_id),
                                      np.asarray(cached.prim_id))
        assert bool(inline.overflow) == bool(cached.overflow)


def test_cache_invalidates_on_sun_and_scene_change():
    r = _renderer()
    params = FrameParams.default()._replace(max_height=jnp.float32(12.0))
    p1 = r.cached_shadow_prepass(params)
    p2 = r.cached_shadow_prepass(params)
    # same key: the stored device arrays come back untouched
    assert p1[0] is p2[0]

    moved = params._replace(
        light_direction=jnp.asarray([0.5, -0.6, 0.1], jnp.float32)
    )
    p3 = r.cached_shadow_prepass(moved)
    assert p3[0] is not p1[0]
    # and the recomputed map matches a fresh prepass for the new sun
    np.testing.assert_array_equal(
        np.asarray(p3[0]), np.asarray(r.shadow_prepass(moved)[0])
    )
    # switching back re-rasters (single-entry cache, like a PSO cache
    # keyed on current state) and reproduces the original map exactly
    p4 = r.cached_shadow_prepass(params)
    np.testing.assert_array_equal(np.asarray(p4[0]), np.asarray(p1[0]))


def test_prepass_rejects_camera_dependent_selection():
    hm = hmod.procedural_heightmap(64, seed=3)
    alb = hmod.procedural_albedo(hm)
    import dataclasses

    r = Renderer(dataclasses.replace(CFG, shadow_select="main"), hm, alb,
                 raster_backend="xla")
    with pytest.raises(AssertionError):
        r.shadow_prepass(FrameParams.default())


def test_adaptive_cached_matches_inline():
    r = _renderer()
    params = FrameParams.default()._replace(max_height=jnp.float32(12.0))
    prepass = r.shadow_prepass(params)
    lum = jnp.float32(0.5)
    out_a, lum_a = r.render_adaptive(_cam(1), params, lum, 1.0 / 60.0)
    out_b, lum_b = r.render_adaptive(_cam(1), params, lum, 1.0 / 60.0,
                                     shadow_prepass=prepass)
    np.testing.assert_array_equal(np.asarray(out_a.ldr),
                                  np.asarray(out_b.ldr))
    np.testing.assert_array_equal(np.asarray(lum_a), np.asarray(lum_b))
