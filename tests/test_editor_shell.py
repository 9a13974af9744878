"""Headless editor shell (Editor.cpp / Renderer::RenderUI analog)."""

import os

import numpy as np
import pytest

from vrenderer_tpu.app import App
from vrenderer_tpu.config import FrameConfig, TerrainSettings
from vrenderer_tpu.editor import Editor


@pytest.fixture(scope="module")
def ed(tmp_path_factory):
    cfg = FrameConfig(
        width=256, height=128,
        terrain=TerrainSettings(surface_size=64, world_size=64,
                                max_instances=64, grid_size=8),
    )
    app = App(cfg, heightmap_resolution=64, raster_backend="xla")
    return Editor(app, out_dir=str(tmp_path_factory.mktemp("ed")))


def test_render_and_stats(ed):
    ed.execute("camera 0 25 45  0 0 0")
    ed.execute("max-height 12")
    resp = ed.execute("render")
    assert "wrote" in resp and "instances=" in resp
    st = ed.execute("stats")
    assert "coverage=" in st and "overflow=False" in st


def test_params_change_without_error(ed):
    ed.execute("light 45 30")
    ed.execute("ambient 0.3")
    ed.execute("exposure 1.5")
    out_lit = ed._render()
    ed.execute("terrain off")
    out_off = ed._render()
    ed.execute("terrain on")
    # terrain off renders sky only (coverage gate: depth clears to far)
    assert np.all(np.asarray(out_off.depth) == 1.0)
    assert np.any(np.asarray(out_lit.depth) < 1.0)


def test_lock_view(ed):
    ed.execute("camera 0 25 45  0 0 0")
    assert "frozen" in ed.execute("lock")
    n_before = int(ed._render().num_instances)
    ed.execute("camera 30 25 45  0 0 0")
    n_locked = int(ed._render().num_instances)
    assert n_locked == n_before  # selection frozen while camera moved
    ed.execute("unlock")


def test_fps_and_exports(ed):
    ed._render()
    fps = ed.execute("fps")
    assert "ms/frame" in fps and "FPS" in fps
    resp = ed.execute("flamegraph")
    path = resp.split()[-1]
    svg = open(path).read()
    assert svg.startswith("<svg") and "Render" in svg
    resp = ed.execute("trace")
    assert os.path.getsize(resp.split()[-1]) > 50


def test_shadow_depth_export(ed):
    resp = ed.execute("shadow-depth")
    assert "wrote" in resp
    assert os.path.getsize(resp.split()[-1]) > 200


def test_unknown_command(ed):
    assert "unknown" in ed.execute("frobnicate")


def test_debug_quadtree_toggle(ed):
    ed.execute("debug-quadtree on")
    out_dbg = ed._render()
    ed.execute("debug-quadtree off")
    out_plain = ed._render()
    d = np.abs(
        np.asarray(out_dbg.ldr) - np.asarray(out_plain.ldr)
    ).max()
    assert d > 0.05  # the tint overlay visibly changes covered pixels
