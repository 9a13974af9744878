"""Light-view LOD selection knobs (map-mode shadow raster).

shadow_select="light" is the reference's actual shadow-pass behavior:
TerrainPass::Render selects from the view it is handed
(TerrainPass.cpp:183 ``NodeSelect(float3(view->GetViewOrigin()), ...)``)
and the shadow phase hands it the CSM proxy view, whose origin sits
~WORLD_SIZE away along the sun (Renderer.cpp:345-348). From that distant
eye the CDLOD rings collapse to the coarsest levels — far fewer, larger
triangles in the light raster. shadow_lod_bias coarsens the main-eye
selection by N levels instead (ranges halve per step).
"""

import jax
import jax.numpy as jnp
import numpy as np

from vrenderer_tpu.config import FrameConfig, TerrainSettings
from vrenderer_tpu.camera import Camera
from vrenderer_tpu.renderer import Renderer, FrameParams
from vrenderer_tpu.ops import shadow
from vrenderer_tpu.terrain import heightmap as hmod

TS = TerrainSettings(surface_size=64, world_size=64, max_instances=512,
                     grid_size=8)


def _build(shadow_select="main", shadow_lod_bias=0):
    cfg = FrameConfig(
        width=256, height=128, terrain=TS,
        shadow_mode="map", shadow_resolution=128,
        shadow_select=shadow_select, shadow_lod_bias=shadow_lod_bias,
    )
    hm = hmod.procedural_heightmap(64, seed=3)
    alb = hmod.procedural_albedo(hm)
    return Renderer(cfg, hm, alb, raster_backend="xla")


CAM = Camera(
    eye=jnp.asarray([3.0, 26.0, 42.0], jnp.float32),
    target=jnp.zeros((3,), jnp.float32),
    up=jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
)
PARAMS = FrameParams.default()._replace(max_height=jnp.float32(12.0))


def _count(r):
    """Light-view selection count through the production path."""
    wtc = shadow.sun_shear_matrices(
        PARAMS.light_direction, float(TS.world_size), PARAMS.max_height,
        r.config.shadow_resolution,
    )[0]
    inst, _, _ = r._light_select(PARAMS, wtc)
    return int(inst.count)


def test_light_eye_selection_is_much_coarser():
    """The distant light eye must select far fewer instances than the
    main-eye whole-world selection, and its depth map must still cover
    the terrain (no holes where the world is)."""
    r_main, r_light = _build("main"), _build("light")
    n_main, n_light = _count(r_main), _count(r_light)
    assert n_light < n_main / 3, (n_light, n_main)
    d_main = np.asarray(jax.jit(r_main._light_depth_pass)(PARAMS)[0])
    d_light = np.asarray(jax.jit(r_light._light_depth_pass)(PARAMS)[0])
    # coverage: the sheared map covers the world lattice; both modes
    # must write (z < far sentinel) over essentially the same footprint
    cov_main = (d_main < 2.0).mean()
    cov_light = (d_light < 2.0).mean()
    assert cov_light > 0.95 * cov_main, (cov_light, cov_main)


def test_lod_bias_monotonically_coarsens():
    counts = [_count(_build("main", shadow_lod_bias=b)) for b in (0, 1, 2)]
    assert counts[0] > counts[1] > counts[2], counts


def test_map_frame_runs_with_light_selection():
    """Full map-mode frame with the reference-parity light selection:
    geometry sharing disables itself, frame renders, no overflow."""
    r = _build("light")
    out = r.render(CAM, PARAMS)
    assert not bool(out.overflow)
    ldr = np.asarray(out.ldr)
    assert np.isfinite(ldr).all()
    assert (np.asarray(out.prim_id) >= 0).mean() > 0.3


def test_biased_frame_matches_default_shape_and_lighting():
    """Bias changes only SHADOW geometry density: coverage and depth of
    the main view must be identical (the main pass selects its own
    geometry), and shadow factors stay within [0, 1]."""
    o0 = _build("main").render(CAM, PARAMS)
    o2 = _build("main", shadow_lod_bias=2).render(CAM, PARAMS)
    assert np.array_equal(np.asarray(o0.prim_id), np.asarray(o2.prim_id))
    np.testing.assert_array_equal(np.asarray(o0.depth),
                                  np.asarray(o2.depth))
    # ldr may differ (different shadow detail) but must stay sane
    d = np.abs(np.asarray(o0.ldr) - np.asarray(o2.ldr))
    assert d.max() <= 1.0
