"""BASELINE.md benchmark configs as correctness tests (small where the
full resolution is impractical on the CPU oracle)."""

import jax.numpy as jnp
import numpy as np

from vrenderer_tpu.config import FrameConfig, TerrainSettings
from vrenderer_tpu.camera import Camera, flythrough
from vrenderer_tpu.renderer import Renderer, FrameParams
from vrenderer_tpu.terrain import heightmap as hmod
from vrenderer_tpu.terrain import quadtree


def test_config1_single_tile_fixed_camera_512():
    """Config 1: single flat terrain tile, 256x256 heightmap, fixed
    camera, 512x512 forward render — exactly as specified (the quadtree
    is bypassed with one whole-surface instance)."""
    cfg = FrameConfig(
        width=512, height=512,
        terrain=TerrainSettings(surface_size=256, world_size=256,
                                max_instances=16, grid_size=32),
    )
    hm = hmod.procedural_heightmap(256, seed=5)
    alb = hmod.procedural_albedo(hm)
    r = Renderer(cfg, hm, alb, raster_backend="xla")
    inst = quadtree.single_tile_instances(cfg.terrain)
    cam = Camera(
        eye=jnp.array([0.0, 90.0, 200.0]),
        target=jnp.array([0.0, 0.0, 0.0]),
        up=jnp.array([0.0, 1.0, 0.0]),
    )
    params = FrameParams.default()._replace(max_height=jnp.float32(40.0))
    out = r.render_locked(cam, params, inst)
    ldr = np.asarray(out.ldr)
    assert ldr.shape == (512, 512, 3)
    assert np.all(np.isfinite(ldr))
    cov = np.asarray(out.prim_id) >= 0
    assert cov.mean() > 0.2
    assert int(out.num_instances) == 1


def test_config2_flythrough_small():
    """Config 2 (downscaled): quadtree LOD + culling over a scripted
    flythrough."""
    cfg = FrameConfig(
        width=256, height=128,
        terrain=TerrainSettings(surface_size=64, world_size=64,
                                max_instances=64, grid_size=8),
    )
    hm = hmod.procedural_heightmap(64, seed=5)
    alb = hmod.procedural_albedo(hm)
    r = Renderer(cfg, hm, alb, raster_backend="xla")
    params = FrameParams.default()._replace(max_height=jnp.float32(12.0))
    cams = flythrough(3, world_size=64.0, altitude=30.0, heightmap=hm,
                      max_height=12.0, clearance=10.0)
    for i in range(3):
        out = r.render(
            Camera(eye=cams.eye[i], target=cams.target[i], up=cams.up[i]),
            params,
        )
        assert np.all(np.isfinite(np.asarray(out.ldr)))
        assert int(out.num_instances) > 0
