"""Multi-chip sharded rendering on the 8-virtual-device CPU mesh: the
sharded frame must equal the single-device frame."""

import jax
import jax.numpy as jnp
import numpy as np

from vrenderer_tpu.config import FrameConfig, TerrainSettings
from vrenderer_tpu.camera import Camera
from vrenderer_tpu.renderer import Renderer, FrameParams
from vrenderer_tpu.parallel import sharded
from vrenderer_tpu.terrain import heightmap as hmod

CFG = FrameConfig(
    width=256,
    height=512,  # 4 supertile rows -> splits over 4 'tile' devices
    terrain=TerrainSettings(surface_size=64, world_size=64, max_instances=64,
                            grid_size=8),
)


def _cameras(n):
    t = np.linspace(0.0, 1.0, n, dtype=np.float32)
    eye = np.stack([t * 5.0, 25.0 + t * 3, 45.0 - t * 5], axis=-1)
    target = np.zeros((n, 3), np.float32)
    up = np.tile(np.array([0.0, 1.0, 0.0], np.float32), (n, 1))
    return Camera(eye=jnp.asarray(eye), target=jnp.asarray(target),
                  up=jnp.asarray(up))


def test_sharded_matches_single_device():
    hm = hmod.procedural_heightmap(64, seed=3)
    alb = hmod.procedural_albedo(hm)
    r = Renderer(CFG, hm, alb, raster_backend="xla")
    params = FrameParams.default()._replace(max_height=jnp.float32(12.0))

    mesh = sharded.make_mesh(8, frame_axis=2)  # 2 frames x 4 bands
    cams = _cameras(2)
    frames = sharded.render_frames_sharded(r, cams, params, mesh)
    frames = np.asarray(frames)
    assert frames.shape == (2, 512, 256, 3)

    for i in range(2):
        cam = Camera(eye=cams.eye[i], target=cams.target[i], up=cams.up[i])
        single = np.asarray(r.render(cam, params).ldr)
        # band rendering rebases edge coefficients (c + b*y0); the f32
        # rounding difference vs global evaluation can flip coverage for
        # a handful of exact-silhouette pixels — allow a tiny fraction of
        # such flips, everything else must match tightly
        diff = np.abs(frames[i] - single).max(axis=-1)
        frac_bad = (diff > 2e-3).mean()
        assert frac_bad < 1e-4, f"{frac_bad:.2e} of pixels differ"
        np.testing.assert_allclose(
            np.sort(diff.reshape(-1))[:-64], 0.0, atol=2e-3
        )


def test_mesh_shapes():
    mesh = sharded.make_mesh(8, frame_axis=2)
    assert mesh.shape == {"frame": 2, "tile": 4}
    mesh1 = sharded.make_mesh(8, frame_axis=1)
    assert mesh1.shape == {"frame": 1, "tile": 8}
