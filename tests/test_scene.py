"""Scene meshes through the shared rasterizer + glTF loader tests."""

import base64
import json
import struct

import jax.numpy as jnp
import numpy as np

from vrenderer_tpu.config import FrameConfig, TerrainSettings
from vrenderer_tpu.camera import Camera
from vrenderer_tpu.models import mesh as meshmod
from vrenderer_tpu.models import scene as scenemod
from vrenderer_tpu.renderer import Renderer, FrameParams
from vrenderer_tpu.terrain import heightmap as hmod
from vrenderer_tpu.utils import math3d

CFG = FrameConfig(
    width=256, height=128,
    terrain=TerrainSettings(surface_size=64, world_size=64, max_instances=64,
                            grid_size=8),
)


def _scene_with_cube(y=18.0, size=8.0):
    return scenemod.Scene(
        instances=[
            scenemod.MeshInstance(
                mesh=meshmod.cube(size, color=(0.9, 0.05, 0.05)),
                transform=math3d.affine_translation(
                    jnp.array([0.0, y, 0.0], jnp.float32)
                ),
            )
        ]
    )


def _render(scene):
    hm = hmod.procedural_heightmap(64, seed=7)
    alb = hmod.procedural_albedo(hm)
    r = Renderer(CFG, hm, alb, raster_backend="xla", scene=scene)
    cam = Camera(
        eye=jnp.array([0.0, 25.0, 45.0], jnp.float32),
        target=jnp.array([0.0, 10.0, 0.0], jnp.float32),
        up=jnp.array([0.0, 1.0, 0.0], jnp.float32),
    )
    params = FrameParams.default()._replace(max_height=jnp.float32(12.0))
    return r.render(cam, params)


def test_cube_renders_above_terrain():
    out = _render(_scene_with_cube())
    prim = np.asarray(out.prim_id)
    n_terrain_tris = CFG.terrain.max_instances * CFG.terrain.tris_per_instance
    cube_px = prim >= n_terrain_tris
    assert cube_px.sum() > 50, "cube must be visible"
    # cube pixels are red-dominant
    hdr = np.asarray(out.hdr)
    red = hdr[cube_px]
    assert red[:, 0].mean() > red[:, 1].mean() * 1.5


def test_cube_occluded_and_occluding():
    # half-buried cube: some cube pixels in front of terrain, terrain
    # visible around it
    out = _render(_scene_with_cube(y=9.0, size=8.0))
    prim = np.asarray(out.prim_id)
    n_terrain = CFG.terrain.max_instances * CFG.terrain.tris_per_instance
    assert (prim >= n_terrain).sum() > 20
    assert ((prim >= 0) & (prim < n_terrain)).sum() > 1000


def _minimal_gltf(tmp_path):
    """One triangle with positions+indices via data-URI buffer."""
    pos = np.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32
    )
    idx = np.asarray([0, 1, 2], np.uint16)
    buf = pos.tobytes() + idx.tobytes()
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [1.0, 2.0, 3.0],
                   "scale": [2.0, 2.0, 2.0]}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0},
            "indices": 1,
            "material": 0,
        }]}],
        "materials": [{"pbrMetallicRoughness":
                       {"baseColorFactor": [0.1, 0.2, 0.9, 1.0]}}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 6},
        ],
        "buffers": [{
            "uri": "data:application/octet-stream;base64,"
            + base64.b64encode(buf).decode(),
            "byteLength": len(buf),
        }],
    }
    p = tmp_path / "tri.gltf"
    p.write_text(json.dumps(gltf))
    return str(p)


def test_load_gltf(tmp_path):
    path = _minimal_gltf(tmp_path)
    scene = scenemod.load_gltf(path)
    assert len(scene.instances) == 1
    inst = scene.instances[0]
    assert inst.mesh.positions.shape == (3, 3)
    assert inst.mesh.tris.shape == (1, 3)
    np.testing.assert_allclose(
        np.asarray(inst.mesh.colors[0]), [0.1, 0.2, 0.9], atol=1e-6
    )
    # node transform: scale 2 then translate (1,2,3)
    w = math3d.affine_apply(inst.transform, inst.mesh.positions)
    np.testing.assert_allclose(
        np.asarray(w[1]), [3.0, 2.0, 3.0], atol=1e-5
    )


def test_load_glb(tmp_path):
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.asarray([0, 1, 2, 0], np.uint16)  # padded to 4-byte align
    bin_chunk = pos.tobytes() + idx.tobytes()
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0}, "indices": 1}]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 6},
        ],
        "buffers": [{"byteLength": len(bin_chunk)}],
    }
    js = json.dumps(gltf).encode()
    js += b" " * (-len(js) % 4)
    glb = struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(js) + 8
                      + len(bin_chunk))
    glb += struct.pack("<II", len(js), 0x4E4F534A) + js
    glb += struct.pack("<II", len(bin_chunk), 0x004E4942) + bin_chunk
    p = tmp_path / "tri.glb"
    p.write_bytes(glb)
    scene = scenemod.load_gltf(str(p))
    assert len(scene.instances) == 1
    assert scene.instances[0].mesh.tris.shape == (1, 3)


def test_transform_mesh_rotated_normals():
    """Normals must transform by inv(L)^T (row-vector convention): a 90-deg
    Y rotation maps the +X face normal to -Z under p' = p @ L with
    L = [[0,0,-1],[0,1,0],[1,0,0]] (x->-z, z->x)."""
    m = meshmod.cube(2.0)
    c, s = 0.0, 1.0
    rot = jnp.array(
        [[c, 0.0, -s], [0.0, 1.0, 0.0], [s, 0.0, c], [0.0, 0.0, 0.0]],
        jnp.float32,
    )
    out = meshmod.transform_mesh(m, rot)
    # positions and normals must rotate identically for a pure rotation
    np.testing.assert_allclose(
        np.asarray(out.normals),
        np.asarray(math3d.normalize(m.normals @ rot[:3, :])),
        atol=1e-6,
    )
    px = np.asarray(m.normals) @ np.array([1, 0, 0.0]) > 0.99
    np.testing.assert_allclose(
        np.asarray(out.normals)[px],
        np.tile([0.0, 0.0, -1.0], (px.sum(), 1)),
        atol=1e-6,
    )


def test_transform_mesh_nonuniform_scale_normals():
    """Non-uniform scale: a slanted face normal must stay perpendicular to
    transformed tangents (the inv-transpose property)."""
    m = meshmod.cube(2.0)
    aff = jnp.array(
        [[2.0, 0, 0], [0, 1.0, 0], [0, 0, 0.5], [0, 0, 0]], jnp.float32
    )
    out = meshmod.transform_mesh(m, aff)
    # tangents along transformed edges of each tri stay orthogonal to the
    # transformed normal
    p = np.asarray(out.positions)
    n = np.asarray(out.normals)
    tris = np.asarray(m.tris)
    e1 = p[tris[:, 1]] - p[tris[:, 0]]
    dots = np.abs(np.sum(n[tris[:, 0]] * e1, axis=-1))
    assert dots.max() < 1e-5


def _png_bytes(pixels_u8):
    """Encode an (H, W, 3) u8 array as PNG (filter 0 rows)."""
    import struct as _st
    import zlib

    h, w = pixels_u8.shape[:2]
    raw = b"".join(
        b"\x00" + pixels_u8[r].tobytes() for r in range(h)
    )

    def chunk(tag, data):
        c = tag + data
        return _st.pack(">I", len(data)) + c + _st.pack(
            ">I", zlib.crc32(c))

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _st.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_load_gltf_base_color_texture(tmp_path):
    # 2x2 texture: TL red, TR green, BL blue, BR white; quad corners
    # sample the texel centers exactly (uv 0..1 maps texel 0..W-1)
    tex = np.asarray(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
        np.uint8,
    )
    png = _png_bytes(tex)
    pos = np.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    uv = np.asarray([[0, 0], [1, 0], [0, 1], [1, 1]], np.float32)
    idx = np.asarray([0, 1, 2, 1, 3, 2], np.uint16)
    buf = pos.tobytes() + uv.tobytes() + idx.tobytes()
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "TEXCOORD_0": 1},
            "indices": 2, "material": 0}]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorTexture": {"index": 0}}}],
        "textures": [{"source": 0}],
        "images": [{"uri": "data:image/png;base64,"
                    + base64.b64encode(png).decode()}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4,
             "type": "VEC2"},
            {"bufferView": 2, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 32},
            {"buffer": 0, "byteOffset": 80, "byteLength": 12},
        ],
        "buffers": [{
            "uri": "data:application/octet-stream;base64,"
            + base64.b64encode(buf).decode(),
            "byteLength": len(buf),
        }],
    }
    p = tmp_path / "tex.gltf"
    p.write_text(json.dumps(gltf))
    scene = scenemod.load_gltf(str(p))
    cols = np.asarray(scene.instances[0].mesh.colors)
    np.testing.assert_allclose(cols[0], [1, 0, 0], atol=2e-2)
    np.testing.assert_allclose(cols[1], [0, 1, 0], atol=2e-2)
    np.testing.assert_allclose(cols[2], [0, 0, 1], atol=2e-2)
    np.testing.assert_allclose(cols[3], [1, 1, 1], atol=2e-2)


def test_load_gltf_vertex_colors(tmp_path):
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    vc = np.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    idx = np.asarray([0, 1, 2, 0], np.uint16)
    buf = pos.tobytes() + vc.tobytes() + idx.tobytes()
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "COLOR_0": 1},
            "indices": 2}]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
            {"buffer": 0, "byteOffset": 72, "byteLength": 6},
        ],
        "buffers": [{
            "uri": "data:application/octet-stream;base64,"
            + base64.b64encode(buf).decode(),
            "byteLength": len(buf),
        }],
    }
    p = tmp_path / "vc.gltf"
    p.write_text(json.dumps(gltf))
    scene = scenemod.load_gltf(str(p))
    cols = np.asarray(scene.instances[0].mesh.colors)
    # default material 0.8 gray x vertex colors
    np.testing.assert_allclose(cols[0], [0.8, 0, 0], atol=1e-6)
    np.testing.assert_allclose(cols[1], [0, 0.8, 0], atol=1e-6)
