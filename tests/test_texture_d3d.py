"""D3D texel-addressing parity (VERDICT r2 missing #5).

The reference samples textures with D3D11 SampleLevel + a linear-clamp
sampler (terrain_vs.hlsl:32, terrain_ps.hlsl:23): texel centers at
half-integers under uv*size - 0.5 with border clamping. torch's
``grid_sample(mode="bilinear", padding_mode="border",
align_corners=False)`` implements exactly the same convention, so it
serves as an independent hardware-semantics oracle for our gather-free
samplers in ``mode="d3d"``.

The framework default stays ``mode="lattice"`` (procedural assets are
authored on the texel lattice); ``TerrainSettings.uv_mode="d3d"``
switches the vertex stage for pixel-diffing against reference captures.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from vrenderer_tpu.config import TerrainSettings
from vrenderer_tpu.ops import texture


def _torch_sample(tex_np, u_np, v_np):
    """grid_sample oracle: uv in [0,1] -> grid in [-1,1]."""
    t = torch.from_numpy(tex_np)[None, None]            # (1, 1, H, W)
    gx = torch.from_numpy(u_np * 2.0 - 1.0)
    gy = torch.from_numpy(v_np * 2.0 - 1.0)
    grid = torch.stack([gx, gy], dim=-1)[None, None]    # (1, 1, n, 2)
    out = F.grid_sample(t, grid, mode="bilinear",
                        padding_mode="border", align_corners=False)
    return out[0, 0, 0].numpy()


def test_sample_points_d3d_matches_torch_grid_sample():
    rng = np.random.default_rng(7)
    tex = rng.random((33, 57), dtype=np.float32)
    # includes out-of-range uvs: border clamp must agree too
    u = rng.uniform(-0.2, 1.2, size=500).astype(np.float32)
    v = rng.uniform(-0.2, 1.2, size=500).astype(np.float32)

    want = _torch_sample(tex, u, v)
    got = np.asarray(texture.sample_points(
        jnp.asarray(tex), jnp.asarray(u), jnp.asarray(v), mode="d3d"
    ))
    np.testing.assert_allclose(got, want, atol=2e-6)

    got_mm = np.asarray(texture.sample_points_matmul(
        jnp.asarray(tex), jnp.asarray(u), jnp.asarray(v), mode="d3d"
    ))
    np.testing.assert_allclose(got_mm, want, atol=2e-6)


def test_sample_separable_d3d_matches_torch_grid_sample():
    rng = np.random.default_rng(11)
    tex = rng.random((40, 24), dtype=np.float32)
    u = rng.uniform(-0.1, 1.1, size=17).astype(np.float32)
    v = rng.uniform(-0.1, 1.1, size=13).astype(np.float32)

    got = np.asarray(texture.sample_separable(
        jnp.asarray(tex), jnp.asarray(u), jnp.asarray(v), mode="d3d"
    ))                                                   # (nv, nu)
    uu, vv = np.meshgrid(u, v)                           # (nv, nu)
    want = _torch_sample(tex, uu.ravel(), vv.ravel()).reshape(got.shape)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_vertex_stage_uv_mode_shifts_heights():
    """uv_mode="d3d" must actually reach the vertex stage: the two modes
    sample half a texel apart, so heights differ on a sloped field."""
    from vrenderer_tpu.camera import Camera
    from vrenderer_tpu.ops import vertex
    from vrenderer_tpu.terrain import quadtree
    from vrenderer_tpu.utils import math3d

    hm = jnp.asarray(
        np.linspace(0, 1, 64, dtype=np.float32)[None, :]
        * np.ones((64, 1), np.float32)
    )
    alb = jnp.zeros((64, 64, 3), jnp.float32)
    shad = jnp.ones((64, 64), jnp.float32)
    eye = jnp.asarray([0.0, 30.0, 40.0], jnp.float32)

    outs = {}
    for mode in ("lattice", "d3d"):
        ts = TerrainSettings(surface_size=64, world_size=64,
                             max_instances=64, grid_size=8, uv_mode=mode)
        cam = Camera(eye=eye, target=jnp.zeros(3, jnp.float32),
                     up=jnp.asarray([0.0, 1.0, 0.0], jnp.float32))
        from vrenderer_tpu.camera import make_view_constants
        vc = make_view_constants(cam, 128, 64, 60.0, 0.1, 1000.0)
        planes = math3d.frustum_planes(vc["world_to_clip"])
        inst, _ = quadtree.select_nodes(ts, cam.eye, planes,
                                        ts.lod_ranges())
        vout = vertex.vertex_stage(ts, inst, cam.eye, hm, alb, shad,
                                   jnp.float32(12.0), ts.lod_ranges())
        outs[mode] = np.asarray(vout.world[np.asarray(inst.valid)][..., 1])

    # identical lattice positions, different addressing -> heights shift
    # by ~slope * half-texel; they must NOT be equal
    diff = np.abs(outs["lattice"] - outs["d3d"]).max()
    assert diff > 1e-4, "uv_mode did not reach the vertex sampler"
    # and the shift is bounded by a texel of this gentle ramp
    assert diff < 0.5
