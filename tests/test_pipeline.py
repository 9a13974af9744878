"""End-to-end frame smoke tests on CPU (small config, both raster paths)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vrenderer_tpu.config import FrameConfig, TerrainSettings, RasterSettings
from vrenderer_tpu.camera import Camera
from vrenderer_tpu.renderer import Renderer, FrameParams
from vrenderer_tpu.terrain import heightmap as hmod

CFG = FrameConfig(
    width=256,
    height=128,
    terrain=TerrainSettings(surface_size=64, world_size=64, max_instances=64,
                            grid_size=8),
    raster=RasterSettings(),
)


def _camera():
    return Camera(
        eye=jnp.array([0.0, 25.0, 45.0], jnp.float32),
        target=jnp.array([0.0, 0.0, 0.0], jnp.float32),
        up=jnp.array([0.0, 1.0, 0.0], jnp.float32),
    )


def _params():
    p = FrameParams.default()
    return p._replace(max_height=jnp.float32(12.0))


@pytest.fixture(scope="module")
def assets():
    hm = hmod.procedural_heightmap(64, seed=7)
    alb = hmod.procedural_albedo(hm)
    return hm, alb


def test_full_frame_pallas_interpret(assets):
    hm, alb = assets
    r = Renderer(CFG, hm, alb, raster_backend="pallas", interpret=True,
                 max_work=256)
    out = r.render(_camera(), _params())
    ldr = np.asarray(out.ldr)
    assert ldr.shape == (128, 256, 3)
    assert np.all(np.isfinite(ldr))
    assert ldr.min() >= 0.0 and ldr.max() <= 1.0
    cov = np.asarray(out.prim_id) >= 0
    assert 0.1 < cov.mean() < 0.95          # terrain and sky both visible
    assert int(out.num_instances) > 0
    # terrain pixels differ from sky pixels
    assert abs(ldr[cov].mean() - ldr[~cov].mean()) > 0.01


def test_full_frame_xla_matches_pallas(assets):
    hm, alb = assets
    rp = Renderer(CFG, hm, alb, raster_backend="pallas", interpret=True,
                  max_work=256)
    rx = Renderer(CFG, hm, alb, raster_backend="xla")
    cam, par = _camera(), _params()
    op = rp.render(cam, par)
    ox = rx.render(cam, par)
    np.testing.assert_array_equal(np.asarray(op.prim_id), np.asarray(ox.prim_id))
    np.testing.assert_allclose(
        np.asarray(op.ldr), np.asarray(ox.ldr), atol=2e-3
    )


def test_editor_param_changes_take_effect_without_recompile(assets):
    hm, alb = assets
    r = Renderer(CFG, hm, alb, raster_backend="xla")
    cam = _camera()
    p1 = _params()
    p2 = p1._replace(ambient_intensity=jnp.float32(0.9))
    o1 = r.render(cam, p1)
    o2 = r.render(cam, p2)
    cov = np.asarray(o1.prim_id) >= 0
    assert np.asarray(o2.hdr)[cov].mean() > np.asarray(o1.hdr)[cov].mean()


def test_shadow_field_properties(assets):
    hm, alb = assets
    from vrenderer_tpu.ops import shadow

    f = shadow.horizon_shadow_field(
        hm, jnp.float32(12.0), 64.0, jnp.asarray([-0.9, -0.25, 0.35])
    )
    f = np.asarray(f)
    assert f.shape == hm.shape
    assert f.min() >= 0.0 and f.max() <= 1.0
    assert 0.05 < f.mean() < 1.0  # some lit, possibly some shadowed
    # sun below horizon: fully dark
    f2 = np.asarray(
        shadow.horizon_shadow_field(
            hm, jnp.float32(12.0), 64.0, jnp.asarray([-0.9, 0.25, 0.35])
        )
    )
    assert f2.max() == 0.0


def test_shadow_depth_pass(assets):
    hm, alb = assets
    cfg = FrameConfig(
        width=256, height=128,
        terrain=TerrainSettings(surface_size=64, world_size=64,
                                max_instances=64, grid_size=8),
        shadow_resolution=128,
    )
    r = Renderer(cfg, hm, alb, raster_backend="xla")
    z = np.asarray(r.render_shadow_depth(_params()))
    assert z.shape == (128, 128)
    cov = z < 1e30
    # the default sun is ~15 deg above the horizon, so the terrain is a
    # grazing band in the light's ortho view
    assert cov.mean() > 0.02
    assert np.all(z[cov] >= 0.0) and np.all(z[cov] <= 1.0)


def test_sky_visible_above_horizon(assets):
    hm, alb = assets
    r = Renderer(CFG, hm, alb, raster_backend="xla")
    cam = Camera(
        eye=jnp.array([0.0, 20.0, 45.0], jnp.float32),
        target=jnp.array([0.0, 40.0, 0.0], jnp.float32),  # looking up
        up=jnp.array([0.0, 1.0, 0.0], jnp.float32),
    )
    out = r.render(cam, _params())
    cov = np.asarray(out.prim_id) >= 0
    assert cov.mean() < 0.3
    sky = np.asarray(out.ldr)[~cov]
    assert sky[:, 2].mean() > sky[:, 0].mean() * 0.9  # bluish sky
