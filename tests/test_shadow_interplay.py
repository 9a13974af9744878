"""Shadow interplay: meshes cast onto terrain, terrain casts onto meshes.

Reference behavior: the shadow phase renders BOTH terrain
(TerrainPass depth-only, Renderer.cpp:354-367) and scene meshes
(RenderCompositeView(DepthPass), Renderer.cpp:371-379) into one cascade,
which DeferredLightingPass PCF-samples for every G-buffer pixel
(Renderer.cpp:417-428) — so terrain and meshes shadow each other both
ways. Here the equivalent is the occluder-merged horizon march
(ops/shadow.py): mesh_top_field projects scene geometry into a top-down
height field, the march runs over max(terrain, mesh tops), and mesh
receivers test their own height against the shadow-line field.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vrenderer_tpu.models import mesh as meshmod
from vrenderer_tpu.ops import shadow


WORLD = 2048.0
RES = 256


def _cube_blocks(center, size, tpb=64):
    m = meshmod.cube(size=size)
    affine = jnp.concatenate(
        [jnp.eye(3, dtype=jnp.float32),
         jnp.asarray(center, jnp.float32)[None, :]], axis=0)
    m = meshmod.transform_mesh(m, affine)
    world, attrs, idx, valid = meshmod.mesh_to_blocks(
        m, tpb, jnp.float32(400.0))
    return world, valid


def _texel(world_xz):
    """world xz -> (row, col) texel index under world_to_uv's lattice."""
    u = (world_xz[0] + WORLD / 2) / WORLD
    v = (world_xz[1] + WORLD / 2) / WORLD
    return int(round(v * (RES - 1))), int(round(u * (RES - 1)))


def test_mesh_top_field_alignment():
    # 40m cube centered at (256, 100, -512): top at y=120
    world, valid = _cube_blocks((256.0, 100.0, -512.0), 40.0)
    top = shadow.mesh_top_field(world, valid, WORLD, RES)
    top = np.asarray(top)
    r, c = _texel((256.0, -512.0))
    assert abs(top[r, c] - 120.0) < 2.0, top[r, c]
    # off-cube texels are empty; cube spans ~5 texels (8m texels)
    assert top[r + 8, c] < -1e8
    assert top[r, c + 8] < -1e8
    assert top[r - 8, c - 8] < -1e8
    # footprint neighbours are also hit (40m cube ~ 5 texels wide)
    assert abs(top[r + 2, c] - 120.0) < 2.0
    assert abs(top[r, c - 2] - 120.0) < 2.0


def test_mesh_casts_onto_terrain():
    # flat terrain at height 0, sun from +x at 30 degrees: shadows extend
    # toward -x
    hm = jnp.zeros((RES, RES), jnp.float32)
    world, valid = _cube_blocks((512.0, 40.0, 0.0), 80.0)
    top = shadow.mesh_top_field(world, valid, WORLD, RES)
    light_dir = jnp.asarray([-np.cos(np.pi / 6), -np.sin(np.pi / 6), 0.0],
                            jnp.float32)  # travels -x, downward
    lit, sline = shadow.horizon_shadow_field(
        hm, jnp.float32(400.0), WORLD, light_dir,
        occluder_h=top, with_shadow_line=True)
    lit = np.asarray(lit)
    sline = np.asarray(sline)
    r, c = _texel((512.0, 0.0))
    # behind the cube (away from the sun, -x side): shadowed terrain
    rb, cb = _texel((512.0 - 60.0, 0.0))
    assert lit[rb, cb] < 0.3, lit[rb, cb]
    # shadow-line height behind the cube is above the terrain
    assert sline[rb, cb] > 10.0
    # in front (sunward, +x side): fully lit
    rf, cf = _texel((512.0 + 120.0, 0.0))
    assert lit[rf, cf] > 0.9, lit[rf, cf]
    # far behind, beyond the shadow length (120m top / tan(30) ~ 140m):
    rfar, cfar = _texel((512.0 - 400.0, 0.0))
    assert lit[rfar, cfar] > 0.9, lit[rfar, cfar]


def test_terrain_casts_onto_mesh_via_shadow_line():
    # a terrain ridge at x ~ 0 of height 200; sun from +x; a low mesh
    # point west of the ridge is shadowed, a high one is lit
    x = np.linspace(-WORLD / 2, WORLD / 2, RES, dtype=np.float32)
    ridge = np.exp(-((x - 0.0) ** 2) / (2 * 60.0 ** 2)) * 0.5  # h01
    hm = jnp.asarray(np.broadcast_to(ridge[None, :], (RES, RES)).copy())
    light_dir = jnp.asarray([-np.cos(np.pi / 6), -np.sin(np.pi / 6), 0.0],
                            jnp.float32)
    lit, sline = shadow.horizon_shadow_field(
        hm, jnp.float32(400.0), WORLD, light_dir, with_shadow_line=True)
    sline = np.asarray(sline)
    r, c = _texel((-150.0, 0.0))  # west of the 200m ridge
    s_here = sline[r, c]
    assert s_here > 50.0  # ridge shadow reaches well above the ground
    # a mesh vertex below the shadow line: shadowed; above: lit
    f_low = shadow.shadow_line_factor(jnp.float32(s_here - 20.0), s_here)
    f_high = shadow.shadow_line_factor(jnp.float32(s_here + 20.0), s_here)
    assert float(f_low) < 0.05
    assert float(f_high) > 0.95


def test_shadow_line_matches_horizon_field_on_terrain():
    # on the terrain surface itself the two formulations agree about WHERE
    # shadow falls (up to penumbra parameterization): deep shadow in the
    # slope form == below the shadow line, fully lit == above
    rng = np.random.default_rng(3)
    hm = jnp.asarray(
        np.cumsum(rng.standard_normal((RES, RES)).astype(np.float32),
                  axis=1) * 0.01 + 0.3)
    hm = jnp.clip(hm, 0.0, 1.0)
    light_dir = jnp.asarray([-0.7, -0.4, -0.3], jnp.float32)
    lit, sline = shadow.horizon_shadow_field(
        hm, jnp.float32(400.0), WORLD, light_dir, with_shadow_line=True)
    lit = np.asarray(lit)
    h_world = np.asarray(hm) * 400.0
    line_lit = np.asarray(
        shadow.shadow_line_factor(jnp.asarray(h_world), jnp.asarray(sline)))
    # agreement on confident pixels (both forms away from their penumbra)
    confident = (lit > 0.95) | (lit < 0.05)
    agree = (lit > 0.5) == (line_lit > 0.5)
    assert agree[confident].mean() > 0.9


def _frame_setup(hm01, scene, shadow_mode="horizon", shadow_res=128):
    from vrenderer_tpu.config import FrameConfig, TerrainSettings
    from vrenderer_tpu.renderer import Renderer, FrameParams
    from vrenderer_tpu.camera import Camera
    from vrenderer_tpu.terrain import heightmap as hmod

    cfg = FrameConfig(
        width=256, height=128,
        terrain=TerrainSettings(surface_size=64, world_size=64,
                                max_instances=64, grid_size=8),
        shadow_mode=shadow_mode, shadow_resolution=shadow_res,
    )
    alb = hmod.procedural_albedo(hm01)
    r = Renderer(cfg, hm01, alb, raster_backend="xla", scene=scene)
    cam = Camera(
        eye=jnp.array([0.0, 25.0, 45.0], jnp.float32),
        target=jnp.array([0.0, 2.0, 0.0], jnp.float32),
        up=jnp.array([0.0, 1.0, 0.0], jnp.float32),
    )
    params = FrameParams.default()._replace(max_height=jnp.float32(12.0))
    return r, cam, params, cfg


def _cube_scene(center, size):
    from vrenderer_tpu.models import scene as scenemod
    from vrenderer_tpu.utils import math3d

    return scenemod.Scene(instances=[
        scenemod.MeshInstance(
            mesh=meshmod.cube(size, color=(0.9, 0.05, 0.05)),
            transform=math3d.affine_translation(
                jnp.asarray(center, jnp.float32)),
        )
    ])


@pytest.mark.parametrize("mode", ["horizon", "map"])
def test_mesh_darkens_terrain_in_frame(mode):
    # flat terrain at y=0, 8m cube resting on it; default sun is 15 deg
    # above the horizon traveling -x: a long shadow stretches -x. Terrain
    # pixels must darken vs the same frame without the cube.
    hm = jnp.zeros((64, 64), jnp.float32)
    scene = _cube_scene((0.0, 4.0, 0.0), 8.0)
    r0, cam, params, cfg = _frame_setup(hm, None, mode)
    r1, _, _, _ = _frame_setup(hm, scene, mode)
    out0 = r0.render(cam, params)
    out1 = r1.render(cam, params)
    l0 = np.asarray(out0.ldr).mean(-1)
    l1 = np.asarray(out1.ldr).mean(-1)
    n_terrain = cfg.terrain.max_instances * cfg.terrain.tris_per_instance
    p0 = np.asarray(out0.prim_id)
    p1 = np.asarray(out1.prim_id)
    both_terrain = (p0 >= 0) & (p0 < n_terrain) & (p1 >= 0) & (p1 < n_terrain)
    darkening = (l0 - l1)[both_terrain]
    assert darkening.max() > 0.05, f"no shadow cast (max {darkening.max()})"
    # darkened area is a contiguous shadow, not speckle: many pixels
    assert (darkening > 0.05).sum() > 30
    # nothing brightens
    assert darkening.min() > -0.02


@pytest.mark.parametrize("mode", ["horizon", "map"])
def test_terrain_darkens_mesh_in_frame(mode):
    # cube in a valley west of a tall ridge, sun traveling -x: the ridge
    # shadows the cube. Against a flat world the same cube is lit.
    x = np.linspace(-32.0, 32.0, 64, dtype=np.float32)
    ridge01 = np.exp(-((x - 16.0) ** 2) / (2 * 4.0 ** 2)).astype(np.float32)
    hm_ridge = jnp.asarray(np.broadcast_to(ridge01[None, :], (64, 64)).copy())
    hm_flat = jnp.zeros((64, 64), jnp.float32)
    scene = _cube_scene((0.0, 2.0, 0.0), 4.0)  # low cube at x=0
    rr, cam, params, cfg = _frame_setup(hm_ridge, scene, mode)
    rf, _, _, _ = _frame_setup(hm_flat, scene, mode)
    outr = rr.render(cam, params)
    outf = rf.render(cam, params)
    n_terrain = cfg.terrain.max_instances * cfg.terrain.tris_per_instance
    cube_r = np.asarray(outr.prim_id) >= n_terrain
    cube_f = np.asarray(outf.prim_id) >= n_terrain
    assert cube_r.sum() > 30 and cube_f.sum() > 30
    lum_r = np.asarray(outr.hdr).mean(-1)[cube_r].mean()
    lum_f = np.asarray(outf.hdr).mean(-1)[cube_f].mean()
    # the 12m ridge east of the cube blocks the 15-degree sun
    assert lum_r < lum_f * 0.7, (lum_r, lum_f)


def test_sun_below_horizon_all_dark():
    hm = jnp.zeros((64, 64), jnp.float32)
    light_dir = jnp.asarray([0.5, 0.2, 0.0], jnp.float32)  # travels upward
    lit, sline = shadow.horizon_shadow_field(
        hm, jnp.float32(400.0), WORLD, light_dir, with_shadow_line=True)
    assert float(jnp.max(lit)) == 0.0
    f = shadow.shadow_line_factor(jnp.full((4,), 1e6), sline[:4, 0])
    assert float(jnp.max(f)) == 0.0


def test_map_mode_shadow_budget_overflow_is_surfaced():
    """The light frustum spans the whole world, so the shadow pass can
    select more nodes than max_active even when the main camera's
    selection fits. Truncating that silently would drop occluders
    (holes of missing shadow); the frame must raise overflow instead."""
    from vrenderer_tpu.config import FrameConfig, TerrainSettings
    from vrenderer_tpu.renderer import Renderer, FrameParams
    from vrenderer_tpu.camera import Camera
    from vrenderer_tpu.terrain import heightmap as hmod

    hm01 = hmod.procedural_heightmap(64, seed=5)
    cfg = FrameConfig(
        width=256, height=128,
        terrain=TerrainSettings(surface_size=64, world_size=64,
                                max_instances=64, grid_size=8),
        shadow_mode="map", shadow_resolution=128,
    )
    alb = hmod.procedural_albedo(hm01)
    # a narrow main view selects few nodes; budget below the light
    # pass's whole-world selection
    r = Renderer(cfg, hm01, alb, raster_backend="xla", max_active=4)
    cam = Camera(
        eye=jnp.array([0.0, 25.0, 45.0], jnp.float32),
        target=jnp.array([0.0, 2.0, 0.0], jnp.float32),
        up=jnp.array([0.0, 1.0, 0.0], jnp.float32),
    )
    params = FrameParams.default()._replace(max_height=jnp.float32(12.0))
    out = r.render(cam, params)
    assert bool(out.overflow), (
        "shadow-pass selection beyond max_active must surface overflow"
    )
