"""Auto-exposure (eye adaptation) — the ToneMappingPass::AdvanceFrame
analog (Renderer.cpp:188-189)."""

import jax.numpy as jnp
import numpy as np

from vrenderer_tpu.config import FrameConfig, TerrainSettings
from vrenderer_tpu.camera import Camera
from vrenderer_tpu.ops import lighting
from vrenderer_tpu.renderer import Renderer, FrameParams
from vrenderer_tpu.terrain import heightmap as hmod


def _frame(lum):
    hdr = jnp.full((8, 8, 3), lum, jnp.float32)
    covered = jnp.ones((8, 8), bool)
    return hdr, covered


def test_ema_converges_to_scene_luminance():
    hdr, cov = _frame(2.0)
    a = jnp.float32(0.1)
    for _ in range(60):
        a, scale = lighting.adapt_exposure(hdr, cov, a, jnp.float32(0.1))
    assert abs(float(a) - 2.0) < 0.02
    assert abs(float(scale) - 0.5 / 2.0) < 0.01


def test_ema_rate_matches_exponential():
    """One step of dt with speed 1 must close 1 - exp(-dt) of the gap."""
    hdr, cov = _frame(1.0)
    a0 = 0.25
    a1, _ = lighting.adapt_exposure(
        hdr, cov, jnp.float32(a0), jnp.float32(0.5)
    )
    expect = a0 + (1.0 - a0) * (1.0 - np.exp(-0.5))
    assert abs(float(a1) - expect) < 1e-5


def test_adapted_range_clamped():
    hdr, cov = _frame(1000.0)
    a, _ = lighting.adapt_exposure(hdr, cov, jnp.float32(4.0),
                                   jnp.float32(100.0))
    assert float(a) <= 4.0 + 1e-6
    hdr, cov = _frame(1e-9)
    a, _ = lighting.adapt_exposure(hdr, cov, jnp.float32(0.02),
                                   jnp.float32(100.0))
    assert float(a) >= 0.02 - 1e-6


def test_renderer_adapts_dark_to_bright():
    """Driving frames with rising light: exposure scale must fall as the
    eye adapts (dark->bright over ~1s), and the carry is jit-threaded."""
    ts = TerrainSettings(surface_size=64, world_size=64, max_instances=64,
                         grid_size=8)
    cfg = FrameConfig(width=256, height=128, terrain=ts)
    hm = hmod.procedural_heightmap(64, seed=7)
    r = Renderer(cfg, hm, hmod.procedural_albedo(hm), raster_backend="xla")
    cam = Camera(eye=jnp.array([0.0, 25.0, 45.0], jnp.float32),
                 target=jnp.zeros(3, jnp.float32),
                 up=jnp.array([0.0, 1.0, 0.0], jnp.float32))
    base = FrameParams.default()._replace(max_height=jnp.float32(12.0))

    a = 0.02  # seed at the dark floor; the scene is brighter than this
    lums = []
    for irr in (0.05, 0.05, 3.0, 3.0, 3.0, 3.0, 3.0, 3.0):
        params = base._replace(light_irradiance=jnp.float32(irr))
        out, a = r.render_adaptive(cam, params, a, 0.25)
        lums.append(float(a))
    # adaptation climbs: dark scene slowly, then faster toward the bright
    # scene's higher luminance
    assert lums[0] < lums[1] < lums[3] < lums[-1]
    # the bright segment (1.5 s) visibly raises adapted luminance vs dark
    assert lums[-1] > lums[1] * 1.5
    assert np.all(np.isfinite(np.asarray(out.ldr)))
