"""Mesh texture fidelity (VERDICT r3 #6): baked-to-vertex colors must
reach texel density so plane interpolation matches per-pixel texture
sampling (the reference's GBufferFillPass textured draw,
Renderer.cpp:384-399). A 256^2 render of a textured quad loaded through
the glTF path must match a torch grid_sample reference to < 2/255."""

import base64
import json
import struct

import numpy as np
import jax.numpy as jnp

from vrenderer_tpu.app import write_png
from vrenderer_tpu.camera import Camera, make_view_constants
from vrenderer_tpu.models import mesh as meshmod
from vrenderer_tpu.models import scene as scenemod
from vrenderer_tpu.ops import raster
from vrenderer_tpu.ops.vertex import ATTR_ALBEDO


def _smooth_texture(n=16):
    """Low-curvature RGB texture: gradients + gentle sinusoids. The
    PL-vs-bilinear error bound is h^2/4 * cross-term; keeping curvature
    moderate keeps the quantized texture's bound well under 2/255 at the
    0.5-texel vertex spacing the loader produces."""
    i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    r = 0.5 + 0.4 * np.sin(2 * np.pi * j / n) * np.cos(2 * np.pi * i / n)
    g = j / (n - 1)
    b = 0.5 + 0.5 * np.sin(2 * np.pi * (i + j) / (2 * n))
    t = np.stack([r, g, b], axis=-1).astype(np.float32)
    return np.clip(t, 0.0, 1.0)


def _write_quad_gltf(tmp_path, tex):
    """Minimal .gltf: one double-sided textured quad (+-40 in x/y at
    z=0), uv (0,0) at (-40,-40) and (1,1) at (40,40)."""
    write_png(str(tmp_path / "tex.png"), tex)
    pos = np.asarray(
        [[-40, -40, 0], [40, -40, 0], [-40, 40, 0], [40, 40, 0]],
        np.float32,
    )
    nrm = np.tile(np.asarray([[0, 0, -1]], np.float32), (4, 1))
    uv = np.asarray([[0, 0], [1, 0], [0, 1], [1, 1]], np.float32)
    idx = np.asarray(
        [0, 1, 2, 2, 1, 3, 0, 2, 1, 1, 2, 3], np.uint16
    )  # both windings: back-face culling keeps the visible side
    blob = pos.tobytes() + nrm.tobytes() + uv.tobytes() + idx.tobytes()
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "name": "quad"}],
        "meshes": [{
            "primitives": [{
                "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                "indices": 3,
                "material": 0,
            }]
        }],
        "materials": [{
            "pbrMetallicRoughness": {"baseColorTexture": {"index": 0}}
        }],
        "textures": [{"source": 0}],
        "images": [{"uri": "tex.png"}],
        "buffers": [{
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(blob).decode(),
            "byteLength": len(blob),
        }],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 32},
            {"buffer": 0, "byteOffset": 128, "byteLength": 24},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4,
             "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 12,
             "type": "SCALAR"},
        ],
    }
    p = tmp_path / "quad.gltf"
    p.write_text(json.dumps(gltf))
    return str(p)


def test_subdivision_reaches_texel_density():
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    uv = np.asarray([[0, 0], [1, 0], [0, 1]], np.float32)
    nrm = np.tile([[0, 0, 1]], (3, 1)).astype(np.float32)
    tris = np.asarray([[0, 1, 2]], np.int64)
    p2, (n2,), uv2, t2, ach = meshmod.subdivide_to_texel_density(
        pos, [nrm], uv, tris, (17, 17), target_texels=1.0
    )
    # every edge ends <= 1 texel (adaptive splitting may use fewer tris
    # than the old uniform 4-split's 1024 — only long edges refine)
    e = np.concatenate([t2[:, [0, 1]], t2[:, [1, 2]], t2[:, [2, 0]]])
    d = np.linalg.norm((uv2[e[:, 0]] - uv2[e[:, 1]]) * 16.0, axis=1)
    assert d.max() <= 1.0 + 1e-6
    assert ach <= 1.0 + 1e-6
    # no T-junctions: shared midpoints are deduplicated
    assert len(p2) == len(np.unique(np.round(p2 * 1e6), axis=0))
    # max_tris cap stops growth AND warns with the achieved density
    # (VERDICT r4 missing #3: never a silent quality cap)
    import warnings as _w

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        p3, _, _, t3, ach3 = meshmod.subdivide_to_texel_density(
            pos, [nrm], uv, tris, (1024, 1024), target_texels=0.1,
            max_tris=1000,
        )
    assert len(t3) <= 1000
    assert ach3 > 0.1
    msgs = [str(r.message) for r in rec]
    assert any("max_tris" in m and f"{ach3:.1f}" in m for m in msgs)


def _edge_texels(uv, tris, scale):
    e = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]])
    return np.linalg.norm((uv[e[:, 0]] - uv[e[:, 1]]) * scale, axis=1)


def test_subdivision_1024_texture_adaptive():
    """A >=1024^2 texture reaches texel density where its UV mapping is
    dense without exploding where it is not (VERDICT r4 missing #3: the
    old uniform 4-split silently shipped under-resolved above 256^2).

    Geometry: quad A's UVs span a 64x64-texel region of the 1024^2
    texture (needs ~16k tris); quad B's span only 16x16 texels — the
    adaptive splitter must spend triangles on A without inflating B
    (the old uniform splitter 4-split EVERY triangle each round)."""
    pos = np.asarray(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
         [3, 0, 0], [4, 0, 0], [4, 1, 0], [3, 1, 0]], np.float32
    )
    uv = np.asarray(
        [[0, 0], [64 / 1023, 0], [64 / 1023, 64 / 1023], [0, 64 / 1023],
         [0, 0], [16 / 1023, 0], [16 / 1023, 16 / 1023], [0, 16 / 1023]],
        np.float32,
    )
    nrm = np.tile([[0, 0, 1]], (8, 1)).astype(np.float32)
    tris = np.asarray(
        [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int64
    )
    import warnings as _w

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        p2, _, uv2, t2, ach = meshmod.subdivide_to_texel_density(
            pos, [nrm], uv, tris, (1024, 1024), target_texels=1.0,
            max_tris=1 << 18,
        )
    # full density reached (no warning) — the adaptive split fits the
    # band + tiny quad in the budget where uniform 4-splitting of the
    # worst edge would have needed ~2M triangles for the band alone
    assert not rec, [str(r.message) for r in rec]
    assert ach <= 1.0 + 1e-6
    d = _edge_texels(uv2, t2, np.asarray([1023.0, 1023.0]))
    assert d.max() <= 1.0 + 1e-6
    assert len(t2) <= 1 << 18
    # adaptivity: quad B (16x16 texels, positions x in [3, 4]) must stay
    # ~2 orders of magnitude smaller than quad A (64x64 texels)
    in_b = p2[t2[:, 0], 0] > 2.0
    assert in_b.sum() <= 1024         # B needs ~16x16x2 = 512 tris
    assert (~in_b).sum() >= 8192      # A carries the real density
    # crack-free: every vertex is unique (no T-junction duplicates)
    assert len(p2) == len(np.unique(np.round(p2 * 1e6), axis=0))


def test_textured_quad_matches_grid_sample(tmp_path):
    import torch
    import torch.nn.functional as F

    tex = _smooth_texture(16)
    tex_q = np.floor(tex * 255.0 + 0.5) / 255.0  # PNG round-trip quantizes
    path = _write_quad_gltf(tmp_path, tex)
    sc = scenemod.load_gltf(path, texture_subdiv_texels=0.5)
    mesh = sc.instances[0].mesh
    assert mesh.num_tris >= 2 * 4**5  # subdivision actually ran

    W = H = 256
    cam = Camera(
        eye=jnp.asarray([0.0, 0.0, -100.0], jnp.float32),
        target=jnp.asarray([0.0, 0.0, 0.0], jnp.float32),
        up=jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
    )
    vc = make_view_constants(cam, W, H)
    world, attrs, tri_idx, valid = meshmod.mesh_to_blocks(
        mesh, 2048, jnp.float32(1.0)
    )
    setup = raster.setup_triangles(
        world, attrs, valid, tri_idx, vc["world_to_clip"], W, H
    )
    z, ids, attr_img = raster.rasterize_xla(setup, W, H)
    covered = np.asarray(ids) >= 0
    assert covered.mean() > 0.3  # the quad fills a large center rect
    albedo = np.asarray(attr_img[..., ATTR_ALBEDO])

    # ground truth: corner screen positions -> affine screen->uv map ->
    # torch bilinear sample (align_corners=True matches u = uv*(W-1))
    from vrenderer_tpu.utils import math3d

    corners = jnp.asarray(
        [[-40, -40, 0], [40, -40, 0], [-40, 40, 0], [40, 40, 0]],
        jnp.float32,
    )
    clip = math3d.transform_points_h(vc["world_to_clip"], corners[None])
    xy, _, _ = math3d.clip_to_screen(clip, W, H)
    xy = np.asarray(xy)[0]
    uv_c = np.asarray([[0, 0], [1, 0], [0, 1], [1, 1]], np.float64)
    A = np.concatenate([xy, np.ones((4, 1))], axis=1)  # (4, 3)
    M, *_ = np.linalg.lstsq(A, uv_c, rcond=None)       # (3, 2)
    py, px = np.nonzero(covered)
    pc = np.stack([px + 0.5, py + 0.5, np.ones_like(px, np.float64)], 1)
    uv_pix = pc @ M
    assert uv_pix.min() > -1e-3 and uv_pix.max() < 1.0 + 1e-3

    t = torch.from_numpy(tex_q.astype(np.float32)).permute(2, 0, 1)[None]
    grid = torch.from_numpy(
        (uv_pix * 2.0 - 1.0).astype(np.float32)
    ).reshape(1, 1, -1, 2)
    want = F.grid_sample(
        t, grid, mode="bilinear", align_corners=True,
        padding_mode="border",
    )[0, :, 0, :].permute(1, 0).numpy()

    got = albedo[covered]
    err = np.abs(got - want).max()
    assert err < 2.0 / 255.0, f"max albedo error {err:.5f} vs 2/255"
