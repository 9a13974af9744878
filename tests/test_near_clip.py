"""Clipless near-plane rasterization (Olano-Greer homogeneous setup).

The reference relies on hardware clipping (behind TerrainPass.cpp:222);
here crossing triangles rasterize their visible w > 0 region directly.
Validated against an explicit CPU geometric clipper feeding the
all-in-front path.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from vrenderer_tpu.config import FrameConfig, TerrainSettings
from vrenderer_tpu.camera import Camera, make_view_constants
from vrenderer_tpu.ops import raster
from vrenderer_tpu.renderer import Renderer, FrameParams
from vrenderer_tpu.terrain import heightmap as hmod

W, H = 128, 64


def _setup_world_tris(tris_world, world_to_clip, attrs=None, w=W, h=H):
    tris_world = np.asarray(tris_world, np.float32)
    n = tris_world.shape[0]
    if attrs is None:
        attrs = np.zeros((n, 3, 1), np.float32)
    attrs = np.asarray(attrs, np.float32)
    A = attrs.shape[-1]
    world = np.zeros((n, 2, 2, 3), np.float32)
    vat = np.zeros((n, 2, 2, A), np.float32)
    world.reshape(n, 4, 3)[:, :3] = tris_world
    vat.reshape(n, 4, A)[:, :3] = attrs
    tri_idx = jnp.asarray([[0, 1, 2]], jnp.int32)
    return raster.setup_triangles(
        jnp.asarray(world), jnp.asarray(vat), jnp.ones((n,), bool),
        tri_idx, jnp.asarray(world_to_clip), w, h,
    )


def _clip_tris_near(tris_world, world_to_clip, attrs, w_min=1e-3):
    """Exact geometric near clipping in homogeneous space (CPU reference):
    returns (clipped world tris, clipped attrs) all with w > w_min."""
    m = np.asarray(world_to_clip, np.float64)
    out_t, out_a = [], []
    for tri, att in zip(np.asarray(tris_world, np.float64),
                        np.asarray(attrs, np.float64)):
        ws = np.asarray([v @ m[:3, 3] + m[3, 3] for v in tri])
        poly = list(zip(tri, att, ws))
        res = []
        for i in range(len(poly)):
            a, b = poly[i], poly[(i + 1) % len(poly)]
            ain, bin_ = a[2] > w_min, b[2] > w_min
            if ain:
                res.append(a)
            if ain != bin_:
                t = (w_min - a[2]) / (b[2] - a[2])
                res.append((
                    a[0] + t * (b[0] - a[0]),
                    a[1] + t * (b[1] - a[1]),
                    w_min,
                ))
        for k in range(1, len(res) - 1):
            out_t.append([res[0][0], res[k][0], res[k + 1][0]])
            out_a.append([res[0][1], res[k][1], res[k + 1][1]])
    if not out_t:
        return np.zeros((0, 3, 3)), np.zeros((0, 3, attrs.shape[-1]))
    return np.asarray(out_t, np.float32), np.asarray(out_a, np.float32)


def _camera_clip(eye=(0.0, 1.0, 0.0), target=(0.0, 0.5, -10.0)):
    cam = Camera(eye=jnp.asarray(eye, jnp.float32),
                 target=jnp.asarray(target, jnp.float32),
                 up=jnp.array([0.0, 1.0, 0.0], jnp.float32))
    vc = make_view_constants(cam, W, H, 60.0, 0.1, 1000.0)
    return vc["world_to_clip"]


def test_crossing_triangle_matches_clipped_reference():
    """A big ground quad passing under/behind the camera: the clipless
    path must reproduce the geometrically clipped render (coverage within
    a 1px boundary band; z/attrs matching on mutual coverage)."""
    wtc = _camera_clip()
    tris = np.asarray([
        [[-50.0, 0.0, 5.0], [50.0, 0.0, 5.0], [0.0, 0.0, -60.0]],
    ])
    attrs = np.asarray([[[1.0], [2.0], [3.0]]])

    s_cross = _setup_world_tris(tris, wtc, attrs)
    assert bool(np.asarray(s_cross.valid)[0]), "crossing tri must be valid"
    z1, id1, a1 = raster.rasterize_xla(s_cross, W, H, tile=(8, 128),
                                       num_attrs=1)

    ctris, cattrs = _clip_tris_near(tris, wtc, attrs)
    assert len(ctris) >= 1, "clipper must keep the visible part"
    s_ref = _setup_world_tris(ctris, wtc, cattrs)
    z2, id2, a2 = raster.rasterize_xla(s_ref, W, H, tile=(8, 128),
                                       num_attrs=1)

    c1 = np.asarray(id1) >= 0
    c2 = np.asarray(id2) >= 0
    assert c1.sum() > 200, "crossing triangle must cover many pixels"
    # coverage agreement away from the clip boundary: erode/dilate by
    # comparing against a 1px-shifted union
    disagree = c1 ^ c2
    # no disagreeing pixel may be interior (all 4 neighbors agreeing same)
    pad1 = np.pad(c1, 1)
    pad2 = np.pad(c2, 1)
    interior1 = (pad1[:-2, 1:-1] & pad1[2:, 1:-1]
                 & pad1[1:-1, :-2] & pad1[1:-1, 2:])
    interior2 = (pad2[:-2, 1:-1] & pad2[2:, 1:-1]
                 & pad2[1:-1, :-2] & pad2[1:-1, 2:])
    assert not np.any(disagree & interior1 & ~c2)
    assert not np.any(disagree & interior2 & ~c1)
    both = c1 & c2
    np.testing.assert_allclose(np.asarray(z1)[both], np.asarray(z2)[both],
                               atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(a1)[both, 0], np.asarray(a2)[both, 0], rtol=2e-3,
        atol=2e-3,
    )


def test_fully_behind_triangle_still_culled():
    wtc = _camera_clip()
    tris = np.asarray([[[-5.0, 0.0, 50.0], [5.0, 0.0, 50.0],
                        [0.0, 5.0, 60.0]]])
    s = _setup_world_tris(tris, wtc)
    assert not bool(np.asarray(s.valid)[0])


def test_in_front_path_unchanged_by_crossing_branch():
    """Fully in-front triangles keep the screen-space setup: z/coverage
    identical to a pre-change capture of the same scene (sanity: the
    where() merge must not perturb them)."""
    wtc = _camera_clip(eye=(0.0, 5.0, 20.0), target=(0.0, 0.0, 0.0))
    tris = np.asarray([
        [[-5.0, 0.0, 0.0], [5.0, 0.0, 0.0], [0.0, 6.0, -3.0]],
    ])
    s = _setup_world_tris(tris, wtc)
    assert bool(np.asarray(s.valid)[0])
    # bbox stays tight (not widened to full frame)
    bb = np.asarray(s.bbox)[0]
    assert bb[2] - bb[0] < W - 1 and bb[3] - bb[1] < H - 1


def test_ground_quad_under_camera_no_holes():
    """End-to-end through the renderer + pallas binning: a large scene
    quad passes under AND behind the camera (both triangles cross w = 0).
    Pre-fix those triangles were culled, leaving the bottom of the frame
    empty; clipless rasterization must cover it. Exercises the
    instance_screen_bbox full-frame widening for crossing instances."""
    from vrenderer_tpu.models import mesh as meshmod
    from vrenderer_tpu.models import scene as scenemod
    from vrenderer_tpu.utils import math3d

    ts = TerrainSettings(surface_size=64, world_size=64, max_instances=64,
                         grid_size=8)
    cfg = FrameConfig(width=256, height=128, terrain=ts)
    hm = jnp.zeros((64, 64), jnp.float32)
    quad = meshmod.Mesh(
        positions=jnp.asarray([[-50.0, 3.0, 20.0], [50.0, 3.0, 20.0],
                               [50.0, 3.0, -60.0], [-50.0, 3.0, -60.0]],
                              jnp.float32),
        normals=jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32),
                         (4, 1)),
        colors=jnp.tile(jnp.asarray([[0.2, 0.8, 0.2]], jnp.float32),
                        (4, 1)),
        # CCW in y-down screen from above: (v0, v1, v2), (v0, v2, v3)
        tris=jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32),
    )
    scene = scenemod.Scene(instances=[scenemod.MeshInstance(
        mesh=quad, transform=math3d.affine_identity()
    )])
    params = FrameParams.default()._replace(max_height=jnp.float32(2.0))
    cam = Camera(eye=jnp.array([0.0, 4.2, 8.0], jnp.float32),
                 target=jnp.array([0.0, 3.6, -20.0], jnp.float32),
                 up=jnp.array([0.0, 1.0, 0.0], jnp.float32))
    for backend, interp in (("xla", False), ("pallas", True)):
        r = Renderer(cfg, hm, hmod.procedural_albedo(hm),
                     raster_backend=backend, interpret=interp,
                     max_work=512, scene=scene)
        out = r.render(cam, params)
        covered = np.asarray(out.prim_id) >= 0
        assert covered[100:, :].all(), (
            f"{backend}: near-plane holes in bottom rows: "
            f"{(~covered[100:, :]).sum()} px"
        )
        assert np.all(np.isfinite(np.asarray(out.ldr)))
