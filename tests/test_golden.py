"""Golden-frame regression: a fixed scene must reproduce the stored image
(CPU/XLA backend is deterministic). Guards against silent pipeline drift —
the role the reference's visual inspection + debug views played
(SURVEY.md §4)."""

import os

import jax.numpy as jnp
import numpy as np

from vrenderer_tpu.config import FrameConfig, TerrainSettings
from vrenderer_tpu.camera import Camera
from vrenderer_tpu.renderer import Renderer, FrameParams
from vrenderer_tpu.terrain import heightmap as hmod

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_frame.npy")


def _render():
    cfg = FrameConfig(
        width=256, height=128,
        terrain=TerrainSettings(surface_size=64, world_size=64,
                                max_instances=64, grid_size=8),
    )
    hm = hmod.procedural_heightmap(64, seed=7)
    alb = hmod.procedural_albedo(hm)
    r = Renderer(cfg, hm, alb, raster_backend="xla")
    cam = Camera(
        eye=jnp.array([0.0, 25.0, 45.0]),
        target=jnp.array([0.0, 0.0, 0.0]),
        up=jnp.array([0.0, 1.0, 0.0]),
    )
    params = FrameParams.default()._replace(max_height=jnp.float32(12.0))
    return r.render(cam, params)


def test_golden_frame():
    out = _render()
    ldr = np.asarray(out.ldr)
    golden = np.load(GOLDEN).astype(np.float32)
    # stored as f16: tolerance covers the quantization plus tiny
    # cross-version XLA fusion drift
    diff = np.abs(ldr - golden)
    assert diff.max() < 5e-3, f"max pixel diff {diff.max()}"
    assert diff.mean() < 5e-4

    cov = np.asarray(out.prim_id) >= 0
    np.testing.assert_allclose(cov.mean(), 0.552856, atol=0.002)
    prim = np.asarray(out.prim_id)
    assert prim[64, 128] == 2144
    assert prim[100, 200] == 3589
