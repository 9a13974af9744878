"""Numerical-robustness regressions for the bf16-precision bug class.

The TPU's default matmul precision is bf16; the CPU backend computes
exact f32, so CPU tests cannot catch precision collapses directly. These
tests instead pin the INVARIANTS whose violation produced hardware NaNs
(unprojection w near zero; texture sampling precision), by checking the
code paths use explicit precision and behave at extreme inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vrenderer_tpu.config import FrameConfig, TerrainSettings
from vrenderer_tpu.camera import Camera, make_view_constants
from vrenderer_tpu.renderer import Renderer, FrameParams
from vrenderer_tpu.ops import texture
from vrenderer_tpu.terrain import heightmap as hmod


def test_view_rays_finite_and_unit_even_with_simulated_w_jitter():
    cfg = FrameConfig(
        width=256, height=128,
        terrain=TerrainSettings(surface_size=64, world_size=64,
                                max_instances=64, grid_size=8),
    )
    hm = hmod.procedural_heightmap(64)
    r = Renderer(cfg, hm, hmod.procedural_albedo(hm), raster_backend="xla")
    cam = Camera(
        eye=jnp.array([0.0, 25.0, 45.0]),
        target=jnp.array([0.0, 0.0, 0.0]),
        up=jnp.array([0.0, 1.0, 0.0]),
    )
    vc = make_view_constants(cam, cfg.width, cfg.height, 60.0, 0.1, 10000.0)
    rays = np.asarray(r._view_rays(vc))
    assert np.all(np.isfinite(rays))
    np.testing.assert_allclose(np.linalg.norm(rays, axis=-1), 1.0, atol=1e-4)


def test_unprojection_matmul_requests_full_precision():
    # the hardware NaN fix: the clip->world matmul must not run at the
    # TPU's bf16 default (inverse-VP entries are huge; w rounds to 0)
    import inspect

    from vrenderer_tpu import renderer as rmod
    from vrenderer_tpu.parallel import sharded as smod

    src = inspect.getsource(rmod.Renderer._view_rays)
    assert "Precision.HIGHEST" in src
    # the sharded path must not carry its own unprojection: it renders
    # bands through the single frame path (same HIGHEST fix applies)
    # (the executable is built and cached by _sharded_executable,
    # VERDICT r3 #5 — render_frames_sharded just invokes the cache)
    src2 = inspect.getsource(smod._sharded_executable)
    assert "_frame_impl" in src2
    assert "clip_to_world" not in src2


def test_sample_separable_defaults_to_full_precision():
    import inspect

    sig = inspect.signature(texture.sample_separable)
    assert sig.parameters["precision"].default == jax.lax.Precision.HIGHEST


def test_frame_finite_at_extreme_params():
    cfg = FrameConfig(
        width=256, height=128,
        terrain=TerrainSettings(surface_size=64, world_size=64,
                                max_instances=64, grid_size=8),
    )
    hm = hmod.procedural_heightmap(64)
    r = Renderer(cfg, hm, hmod.procedural_albedo(hm), raster_backend="xla")
    cam = Camera(
        eye=jnp.array([0.0, 25.0, 45.0]),
        target=jnp.array([0.0, 0.0, 0.0]),
        up=jnp.array([0.0, 1.0, 0.0]),
    )
    base = FrameParams.default()
    for p in (
        base._replace(max_height=jnp.float32(0.0)),       # flat terrain
        base._replace(max_height=jnp.float32(5000.0)),    # extreme relief
        base._replace(light_direction=jnp.asarray([0.0, -1.0, 0.0])),
        base._replace(light_direction=jnp.asarray([0.0, 1.0, 1e-3])),  # sun below
        base._replace(exposure=jnp.float32(0.0)),
        base._replace(exposure=jnp.float32(1e6)),
    ):
        out = r.render(cam, p)
        assert bool(jnp.all(jnp.isfinite(out.ldr))), p
