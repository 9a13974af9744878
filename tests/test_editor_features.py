"""Editor-parity features: wireframe, lock-view, debug selection, reload."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from vrenderer_tpu.config import FrameConfig, TerrainSettings, RasterSettings
from vrenderer_tpu.camera import Camera
from vrenderer_tpu.renderer import Renderer, FrameParams
from vrenderer_tpu.terrain import heightmap as hmod

TS = TerrainSettings(surface_size=64, world_size=64, max_instances=64,
                     grid_size=8)
CFG = FrameConfig(width=256, height=128, terrain=TS)


def _setup(raster=None):
    hm = hmod.procedural_heightmap(64, seed=7)
    alb = hmod.procedural_albedo(hm)
    cfg = CFG if raster is None else dataclasses.replace(CFG, raster=raster)
    return Renderer(cfg, hm, alb, raster_backend="xla"), hm


def _cam(eye=(0.0, 25.0, 45.0), target=(0.0, 0.0, 0.0)):
    return Camera(
        eye=jnp.asarray(eye, jnp.float32),
        target=jnp.asarray(target, jnp.float32),
        up=jnp.array([0.0, 1.0, 0.0], jnp.float32),
    )


PARAMS = FrameParams.default()._replace(max_height=jnp.float32(12.0))


def test_wireframe_reduces_coverage():
    r_fill, _ = _setup()
    r_wire, _ = _setup(RasterSettings(wireframe=True))
    # close-up view so triangles span many pixels (wireframe interiors
    # only open up when triangles are larger than the line width)
    cam = _cam(eye=(2.0, 13.0, 1.0), target=(0.0, 10.0, -2.0))
    fill = np.asarray(r_fill.render(cam, PARAMS).prim_id) >= 0
    wire = np.asarray(r_wire.render(cam, PARAMS).prim_id) >= 0
    # interiors of near (large) triangles open up
    assert (fill & ~wire).sum() > 300
    # wireframe pixels are a subset of filled pixels
    assert np.all(fill[wire])


def test_lock_view_freezes_selection():
    r, _ = _setup()
    cam0 = _cam()
    inst0 = r.select(cam0)
    cam1 = _cam(eye=(20.0, 25.0, 45.0))
    locked = r.render_locked(cam1, PARAMS, inst0)
    fresh = r.render(cam1, PARAMS)
    # same camera, different instance sets -> different images
    assert not np.array_equal(
        np.asarray(locked.prim_id), np.asarray(fresh.prim_id)
    )
    # locked render from the original camera == unlocked render
    locked0 = r.render_locked(cam0, PARAMS, inst0)
    np.testing.assert_array_equal(
        np.asarray(locked0.prim_id), np.asarray(r.render(cam0, PARAMS).prim_id)
    )


def test_debug_selection_masks():
    r, _ = _setup()
    dbg = r.debug_selection(_cam())
    sel = np.asarray(dbg.selected)
    cul = np.asarray(dbg.culled)
    assert sel.shape == (TS.num_lods + 1, TS.select_window, TS.select_window)
    assert sel.sum() > 0
    assert not np.any(sel & cul)


def test_reload_pipelines_keeps_output():
    r, _ = _setup()
    cam = _cam()
    before = np.asarray(r.render(cam, PARAMS).ldr)
    r.reload_pipelines()
    after = np.asarray(r.render(cam, PARAMS).ldr)
    np.testing.assert_array_equal(before, after)
