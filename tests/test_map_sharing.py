"""Map-mode geometry sharing (VERDICT r3 #4): the main pass consumes the
light pass's whole-world selection + shared vertex geometry. The claim:
that selection is a SUPERSET of the main-frustum selection from the same
eye whose extras are off-screen, so the image equals an unshared render
driven by the main selection (up to exact-z seam ties, which re-break
when instance ids renumber under the superset's compaction)."""

import jax.numpy as jnp
import numpy as np

from vrenderer_tpu.config import FrameConfig, TerrainSettings
from vrenderer_tpu.camera import Camera
from vrenderer_tpu.renderer import Renderer, FrameParams
from vrenderer_tpu.terrain import heightmap as hmod

CFG = FrameConfig(
    width=256, height=128,
    terrain=TerrainSettings(surface_size=64, world_size=64,
                            max_instances=64, grid_size=8),
    shadow_mode="map", shadow_resolution=128,
)


def test_shared_frame_equals_unshared_main_selection():
    hm = hmod.procedural_heightmap(64, seed=3)
    alb = hmod.procedural_albedo(hm)
    r = Renderer(CFG, hm, alb, raster_backend="xla")
    params = FrameParams.default()._replace(max_height=jnp.float32(12.0))
    cam = Camera(
        eye=jnp.asarray([3.0, 26.0, 42.0], jnp.float32),
        target=jnp.zeros((3,), jnp.float32),
        up=jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
    )

    shared = r.render(cam, params)           # shares light geometry
    inst_main = r.select(cam)                # main-frustum selection
    locked = r.render_locked(cam, params, inst_main)  # unshared path

    # the light selection is a superset (light frustum spans the world)
    assert int(shared.num_instances) >= int(locked.num_instances)

    a = np.asarray(shared.ldr)
    b = np.asarray(locked.ldr)
    diff = np.abs(a - b).max(axis=-1)
    # identical except (rare) seam-tie flips
    assert (diff > 2e-3).mean() < 1e-3, f"{(diff > 2e-3).mean():.2e}"
    np.testing.assert_allclose(
        np.sort(diff.reshape(-1))[:-32], 0.0, atol=2e-3
    )
    # depth itself must agree everywhere covered by both (ties share z)
    ca = np.asarray(shared.prim_id) >= 0
    cb = np.asarray(locked.prim_id) >= 0
    both = ca & cb
    assert (ca != cb).mean() < 1e-3  # coverage identical up to ties
    np.testing.assert_allclose(
        np.asarray(shared.depth)[both], np.asarray(locked.depth)[both],
        atol=1e-6,
    )

    # REGRESSION (round 4 hardware golden failure): the whole-world
    # selection includes behind-camera instances whose clipless setup
    # bboxes are conservative full-screen — unmasked they flooded the
    # work list (6295 items vs 2048 capacity at the map bench config)
    # and truncation punched 12% coverage holes. The share path masks
    # the shared packing by exact (x, z, lod) MEMBERSHIP in the main
    # selection (scripts/probe_sharemask.py for the rejected AABB
    # rules), so its work list must EQUAL the unshared render's.
    assert int(shared.num_work_items) == int(locked.num_work_items), (
        f"shared work list differs: {int(shared.num_work_items)} vs "
        f"unshared {int(locked.num_work_items)}"
    )
