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


def test_quantized_eye_cache_bit_identical_and_invalidates():
    """shadow_select="main" + shadow_eye_quant: the view-matched shadow
    map becomes piecewise-constant in camera position (the selection eye
    snaps to the quant lattice), so cached frames must be bit-identical
    to inline frames for ANY camera in the same cell, and the cache must
    re-key exactly on cell crossings (VERDICT r4 next #4)."""
    import dataclasses

    hm = hmod.procedural_heightmap(64, seed=3)
    alb = hmod.procedural_albedo(hm)
    cfg = dataclasses.replace(CFG, shadow_select="main",
                              shadow_eye_quant=16.0)
    r = Renderer(cfg, hm, alb, raster_backend="xla")
    params = FrameParams.default()._replace(max_height=jnp.float32(12.0))

    cam_a = _cam(0)
    # same 16-unit cell as cam_a (eye moved < 1 cell, no floor crossing)
    cam_b = Camera(eye=cam_a.eye + jnp.asarray([2.0, 1.0, -3.0]),
                   target=cam_a.target, up=cam_a.up)
    p_a = r.cached_shadow_prepass(params, camera_pos=cam_a.eye)
    p_b = r.cached_shadow_prepass(params, camera_pos=cam_b.eye)
    assert p_a[0] is p_b[0], "same quant cell must be a cache hit"

    for cam in (cam_a, cam_b):
        inline = r.render(cam, params)                 # in-frame raster
        cached = r.render(cam, params, shadow_prepass=p_a)
        np.testing.assert_array_equal(np.asarray(inline.ldr),
                                      np.asarray(cached.ldr))
        np.testing.assert_array_equal(np.asarray(inline.depth),
                                      np.asarray(cached.depth))
        np.testing.assert_array_equal(np.asarray(inline.prim_id),
                                      np.asarray(cached.prim_id))

    # crossing a cell boundary re-rasters, and the new map matches a
    # fresh standalone prepass at the new eye
    cam_c = Camera(eye=cam_a.eye + jnp.asarray([20.0, 0.0, 0.0]),
                   target=cam_a.target, up=cam_a.up)
    p_c = r.cached_shadow_prepass(params, camera_pos=cam_c.eye)
    assert p_c[0] is not p_a[0], "cell crossing must re-key the cache"
    np.testing.assert_array_equal(
        np.asarray(p_c[0]),
        np.asarray(r.shadow_prepass(params, camera_pos=cam_c.eye)[0]),
    )


def test_quantized_eye_selection_piecewise_constant():
    """The light-pass depth map is constant within a quant cell and
    equals the map rendered from the snapped cell-center eye."""
    import dataclasses

    hm = hmod.procedural_heightmap(64, seed=3)
    alb = hmod.procedural_albedo(hm)
    cfg = dataclasses.replace(CFG, shadow_select="main",
                              shadow_eye_quant=16.0)
    r = Renderer(cfg, hm, alb, raster_backend="xla")
    params = FrameParams.default()._replace(max_height=jnp.float32(12.0))
    eye1 = jnp.asarray([3.0, 26.0, 42.0], jnp.float32)
    eye2 = jnp.asarray([12.0, 18.0, 34.0], jnp.float32)  # same cells
    z1 = r.shadow_prepass(params, camera_pos=eye1)[0]
    z2 = r.shadow_prepass(params, camera_pos=eye2)[0]
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))


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


def test_horizon_prepass_bit_identical_and_invalidates():
    """Horizon mode with a scene: the mesh-occluder shadow field +
    shadow-line field are camera-independent, so cached frames must be
    BIT-IDENTICAL to inline frames (no quantization — exact), and the
    cache must re-key on sun changes (round 5: the inline per-frame
    field cost 24 ms/frame through padded blocks before the compact
    top-field + cache fix)."""
    import dataclasses

    from vrenderer_tpu.models import scene as scenemod

    hm = hmod.procedural_heightmap(64, seed=3)
    alb = hmod.procedural_albedo(hm)
    cfg = dataclasses.replace(CFG, shadow_mode="horizon")
    r = Renderer(cfg, hm, alb, raster_backend="xla",
                 scene=scenemod.Scene.default())
    params = FrameParams.default()._replace(max_height=jnp.float32(12.0))

    p1 = r.cached_horizon_prepass(params)
    p2 = r.cached_horizon_prepass(params)
    assert p1[0] is p2[0], "same (sun, scene) must be a cache hit"
    for i in range(2):
        inline = r.render(_cam(i), params)
        cached = r.render(_cam(i), params, shadow_prepass=p1)
        np.testing.assert_array_equal(np.asarray(inline.ldr),
                                      np.asarray(cached.ldr))
        np.testing.assert_array_equal(np.asarray(inline.depth),
                                      np.asarray(cached.depth))

    moved = params._replace(
        light_direction=jnp.asarray([0.5, -0.6, 0.1], jnp.float32)
    )
    p3 = r.cached_horizon_prepass(moved)
    assert p3[0] is not p1[0], "sun change must re-key"
    np.testing.assert_array_equal(
        np.asarray(p3[0]), np.asarray(r.horizon_shadow_prepass(moved)[0])
    )
