"""Per-frame traced scene transforms — the Scene::RefreshSceneGraph /
RefreshBuffers analog (Renderer.cpp:204, 328-331): scene geometry stays
object-space and per-instance transforms enter the jitted frame as traced
arguments, so moving an instance never rebuilds the Renderer and never
recompiles."""

import jax.numpy as jnp
import numpy as np

from vrenderer_tpu.config import FrameConfig, TerrainSettings
from vrenderer_tpu.camera import Camera
from vrenderer_tpu.models import mesh as meshmod, scene as scenemod
from vrenderer_tpu.renderer import Renderer, FrameParams
from vrenderer_tpu.terrain import heightmap as hmod
from vrenderer_tpu.utils import math3d

CFG = FrameConfig(
    width=256, height=128,
    terrain=TerrainSettings(surface_size=64, world_size=64, max_instances=64,
                            grid_size=8),
)


def _cam():
    return Camera(eye=jnp.array([0.0, 25.0, 45.0], jnp.float32),
                  target=jnp.zeros(3, jnp.float32),
                  up=jnp.array([0.0, 1.0, 0.0], jnp.float32))


def _scene(xf):
    return scenemod.Scene(instances=[
        scenemod.MeshInstance(
            mesh=meshmod.cube(8.0, color=(0.9, 0.05, 0.05)), transform=xf
        )
    ])


def _assets():
    hm = hmod.procedural_heightmap(64, seed=3)
    return hm, hmod.procedural_albedo(hm)


def _red_mask(out):
    ldr = np.asarray(out.ldr)
    return (ldr[..., 0] > 0.5) & (ldr[..., 1] < 0.35)


def test_traced_transforms_match_baked_geometry():
    """Applying the transform per frame (object-space + traced xf) must
    equal baking it into the vertices (transform_mesh + identity xf) —
    including rotated normals (inverse-transpose path)."""
    hm, alb = _assets()
    # rotation about y + translation: exercises the normal rotation
    c, s = np.cos(0.7), np.sin(0.7)
    rot = jnp.asarray(
        [[c, 0.0, -s], [0.0, 1.0, 0.0], [s, 0.0, c], [0.0, 6.0, 10.0]],
        jnp.float32,
    )
    params = FrameParams.default()._replace(max_height=jnp.float32(12.0))

    r_traced = Renderer(CFG, hm, alb, raster_backend="xla",
                        scene=_scene(rot))
    baked_mesh = meshmod.transform_mesh(
        meshmod.cube(8.0, color=(0.9, 0.05, 0.05)), rot
    )
    r_baked = Renderer(
        CFG, hm, alb, raster_backend="xla",
        scene=scenemod.Scene(instances=[
            scenemod.MeshInstance(mesh=baked_mesh,
                                  transform=math3d.affine_identity())
        ]),
    )
    a = r_traced.render(_cam(), params)
    b = r_baked.render(_cam(), params)
    assert _red_mask(a).sum() > 20  # cube visible
    np.testing.assert_allclose(
        np.asarray(a.ldr), np.asarray(b.ldr), atol=2e-3
    )


def test_transform_update_no_recompile():
    """Moving an instance = updating scene_transforms: next frame shows
    the move, and the frame executable is reused (cache size stays 1)."""
    hm, alb = _assets()
    xf = math3d.affine_translation(
        jnp.asarray([0.0, 6.0, 10.0], jnp.float32)
    )
    r = Renderer(CFG, hm, alb, raster_backend="xla", scene=_scene(xf))
    params = FrameParams.default()._replace(max_height=jnp.float32(12.0))
    out0 = r.render(_cam(), params)
    m0 = _red_mask(out0)
    assert m0.sum() > 20

    r.scene_transforms = r.scene_transforms.at[0, 3, 0].add(12.0)
    out1 = r.render(_cam(), params)
    m1 = _red_mask(out1)
    assert m1.sum() > 5
    # the cube's pixel footprint moved
    assert (m0 != m1).sum() > 20
    assert r._frame_jit._cache_size() == 1


def test_editor_move_instance_command():
    from vrenderer_tpu.app import App
    from vrenderer_tpu.editor import Editor

    app = App(CFG, heightmap_resolution=64, raster_backend="xla",
              scene=_scene(math3d.affine_translation(
                  jnp.asarray([0.0, 6.0, 10.0], jnp.float32))))
    app.params = app.params._replace(max_height=jnp.float32(12.0))
    ed = Editor(app=app)
    ed.execute("camera 0 25 45")
    ed.execute("render")
    m0 = _red_mask(ed.last_output)
    renderer_before = app.renderer
    resp = ed.execute("move-instance 0 12 0 0")
    assert "instance 0" in resp
    ed.execute("render")
    m1 = _red_mask(ed.last_output)
    assert app.renderer is renderer_before  # no rebuild
    assert (m0 != m1).sum() > 20


def test_shadow_follows_moved_instance():
    """mesh-top occluders track the traced transform: the cast shadow
    moves with the cube (horizon mode)."""
    hm, alb = _assets()
    xf = math3d.affine_translation(
        jnp.asarray([0.0, 10.0, 0.0], jnp.float32)
    )
    r = Renderer(CFG, hm, alb, raster_backend="xla", scene=_scene(xf))
    params = FrameParams.default()._replace(max_height=jnp.float32(6.0))
    s0 = np.asarray(
        r.render(_cam(), params).ldr
    )
    r.scene_transforms = r.scene_transforms.at[0, 3, 0].add(20.0)
    s1 = np.asarray(r.render(_cam(), params).ldr)
    # terrain shading changes where the shadow was / now is
    assert np.abs(s0 - s1).max() > 0.05
