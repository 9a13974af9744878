"""Scene: mesh instances + lights + a minimal glTF 2.0 loader.

The reference's scene system is Donut's engine::Scene — GLTF scene graph,
async load kicked off from main (BeginLoadingScene, main.cpp:89-95 →
Renderer::LoadScene, Renderer.cpp:101-122), default sun attached when the
file has no lights (Renderer.cpp:124-147). This module covers that
surface headlessly:

* ``Scene``: mesh instances (mesh + affine transform), directional light,
  bounds; ``Scene.default()`` is the Cube.gltf-equivalent startup scene.
* ``load_gltf``: dependency-free glTF 2.0 (.gltf with external/B64 buffer,
  or .glb) loader for triangle meshes: POSITION/NORMAL attributes,
  indices, node transforms, material base color. Enough to ingest simple
  scenes like the reference's Cube.gltf; unsupported features fail loudly.
"""

from __future__ import annotations

import base64
import json
import os
import struct
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from vrenderer_tpu.config import LightParams
from vrenderer_tpu.models.mesh import Mesh
from vrenderer_tpu.utils import math3d


@dataclass
class MeshInstance:
    mesh: Mesh
    transform: jnp.ndarray  # (4, 3) row-vector affine
    name: str = ""


@dataclass
class Scene:
    instances: List[MeshInstance] = field(default_factory=list)
    light: Optional[LightParams] = None

    @staticmethod
    def default() -> "Scene":
        """Startup scene: one cube at the origin + the reference's default
        sun (Renderer.cpp:135-142), standing in for Cube.gltf."""
        from vrenderer_tpu.models.mesh import cube

        return Scene(
            instances=[
                MeshInstance(
                    mesh=cube(40.0, color=(0.8, 0.2, 0.2)),
                    transform=math3d.affine_translation(
                        jnp.array([0.0, 120.0, 0.0], jnp.float32)
                    ),
                    name="Cube",
                )
            ],
            light=LightParams(),
        )

    def ensure_light(self) -> LightParams:
        """SceneLoaded(): attach the default sun if none (Renderer.cpp:133)."""
        if self.light is None:
            self.light = LightParams()
        return self.light


# ---------------------------------------------------------------------------
# glTF 2.0 loading (subset)
# ---------------------------------------------------------------------------

_COMPONENT = {
    5120: ("b", 1), 5121: ("B", 1), 5122: ("h", 2),
    5123: ("H", 2), 5125: ("I", 4), 5126: ("f", 4),
}
_NCOMP = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4, "MAT4": 16}


def _read_accessor(gltf: dict, buffers: List[bytes], idx: int) -> np.ndarray:
    acc = gltf["accessors"][idx]
    view = gltf["bufferViews"][acc["bufferView"]]
    buf = buffers[view.get("buffer", 0)]
    fmt, csize = _COMPONENT[acc["componentType"]]
    ncomp = _NCOMP[acc["type"]]
    count = acc["count"]
    offset = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
    stride = view.get("byteStride", csize * ncomp)
    out = np.empty((count, ncomp), np.float64)
    for i in range(count):
        vals = struct.unpack_from(f"<{ncomp}{fmt}", buf, offset + i * stride)
        out[i] = vals
    if acc.get("normalized"):
        out /= float(2 ** (8 * csize) - 1)
    return out


def _decode_png(data: bytes) -> np.ndarray:
    """Minimal PNG decoder (8-bit gray/RGB/RGBA, non-interlaced) — keeps
    the loader dependency-free, mirroring the writer in app.py. Returns
    (H, W, 3) float in [0, 1]."""
    import zlib

    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    off = 8
    idat = b""
    w = h = depth = ctype = None
    while off < len(data):
        (clen,) = struct.unpack_from(">I", data, off)
        tag = data[off + 4: off + 8]
        body = data[off + 8: off + 8 + clen]
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            assert depth == 8, "only 8-bit PNGs supported"
            assert interlace == 0, "interlaced PNGs unsupported"
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        off += 12 + clen
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(idat)
    stride = w * nch
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    pos = 0
    for row in range(h):
        filt = raw[pos]
        line = np.frombuffer(raw[pos + 1: pos + 1 + stride], np.uint8)
        pos += 1 + stride
        cur = line.astype(np.int32)
        if filt == 0:
            rec = cur
        elif filt == 2:  # Up
            rec = (cur + prev) & 0xFF
        else:  # Sub / Average / Paeth need sequential left-neighbors
            rec = np.zeros(stride, np.int32)
            for i in range(stride):
                a = rec[i - nch] if i >= nch else 0
                b = int(prev[i])
                if filt == 1:
                    pred = a
                elif filt == 3:
                    pred = (a + b) // 2
                else:  # Paeth
                    c = int(prev[i - nch]) if i >= nch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c
                    )
                rec[i] = (cur[i] + pred) & 0xFF
        out[row] = rec.astype(np.uint8)
        prev = out[row]
    img = out.reshape(h, w, nch).astype(np.float32) / 255.0
    if nch == 1:
        img = np.repeat(img, 3, axis=-1)
    elif nch == 2:
        img = np.repeat(img[..., :1], 3, axis=-1)
    else:
        img = img[..., :3]
    return img


def _sample_bilinear(img: np.ndarray, uv: np.ndarray) -> np.ndarray:
    """Bilinear sample (H, W, 3) at (N, 2) uv (wrap addressing, the glTF
    default sampler). Host-side numpy — runs once at LOAD time, so the
    frame path stays gather-free (colors are baked to vertices)."""
    H, W = img.shape[:2]

    def wrap(x):
        f = x - np.floor(x)
        # REPEAT, but an exact upper edge (u = 1, 2, ...) stays at 1.0
        # rather than collapsing onto the left texel
        return np.where((x != 0.0) & (f == 0.0), 1.0, f)

    u = wrap(uv[:, 0]) * (W - 1)
    v = wrap(uv[:, 1]) * (H - 1)
    x0 = np.floor(u).astype(np.int64)
    y0 = np.floor(v).astype(np.int64)
    x1 = np.minimum(x0 + 1, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    fx = (u - x0)[:, None]
    fy = (v - y0)[:, None]
    a = img[y0, x0]
    b = img[y0, x1]
    c = img[y1, x0]
    d = img[y1, x1]
    return (a * (1 - fx) + b * fx) * (1 - fy) + (c * (1 - fx) + d * fx) * fy


def _node_transform(node: dict) -> np.ndarray:
    """glTF node -> (4, 3) row-vector affine (column-major M in the file,
    v' = M @ v for column vectors == v @ M^T for row vectors)."""
    if "matrix" in node:
        m = np.asarray(node["matrix"], np.float32).reshape(4, 4)  # col-major
        m = m.T  # row-major, column-vector convention: v' = v_h @ m^T...
        lin = m[:3, :3].T
        tr = m[:3, 3]
        return np.concatenate([lin, tr[None, :]], axis=0).astype(np.float32)
    t = np.asarray(node.get("translation", [0, 0, 0]), np.float32)
    s = np.asarray(node.get("scale", [1, 1, 1]), np.float32)
    q = np.asarray(node.get("rotation", [0, 0, 0, 1]), np.float32)
    x, y, z, w = q
    rot = np.asarray(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y + z * w), 2 * (x * z - y * w)],
            [2 * (x * y - z * w), 1 - 2 * (x * x + z * z), 2 * (y * z + x * w)],
            [2 * (x * z + y * w), 2 * (y * z - x * w), 1 - 2 * (x * x + y * y)],
        ],
        np.float32,
    )
    # row-vector affine: v' = (v * S) @ R + t
    lin = np.diag(s) @ rot
    return np.concatenate([lin, t[None, :]], axis=0).astype(np.float32)


def load_gltf(path: str, texture_subdiv_texels: float = 1.0,
              max_subdiv_tris: int = 1 << 18) -> Scene:
    """Load a .gltf / .glb file into a Scene (triangle meshes only).

    ``texture_subdiv_texels``: textured primitives are midpoint-
    subdivided until every edge spans at most this many texels in UV
    space BEFORE the base-color texture is baked to vertex colors, so
    plane-interpolated vertex colors reach the texture's texel density —
    the parity mechanism for Donut's per-pixel sampling (GBufferFillPass,
    Renderer.cpp:384-399); the terrain gets the same guarantee from its
    grid density. None/0 disables; ``max_subdiv_tris`` caps growth."""
    if path.endswith(".glb"):
        raw = open(path, "rb").read()
        magic, _, _ = struct.unpack_from("<III", raw, 0)
        assert magic == 0x46546C67, "not a GLB file"
        off = 12
        gltf = None
        buffers: List[bytes] = []
        while off < len(raw):
            clen, ctype = struct.unpack_from("<II", raw, off)
            data = raw[off + 8: off + 8 + clen]
            if ctype == 0x4E4F534A:  # JSON
                gltf = json.loads(data)
            elif ctype == 0x004E4942:  # BIN
                buffers.append(data)
            off += 8 + clen
        assert gltf is not None
    else:
        gltf = json.load(open(path))
        buffers = []
        base_dir = os.path.dirname(path)
        for b in gltf.get("buffers", []):
            uri = b.get("uri", "")
            if uri.startswith("data:"):
                buffers.append(base64.b64decode(uri.split(",", 1)[1]))
            else:
                buffers.append(open(os.path.join(base_dir, uri), "rb").read())

    materials = gltf.get("materials", [])
    _image_cache: dict = {}

    def _load_image(idx: int):
        if idx in _image_cache:
            return _image_cache[idx]
        img_def = gltf["images"][idx]
        data = None
        if "bufferView" in img_def:
            view = gltf["bufferViews"][img_def["bufferView"]]
            buf = buffers[view.get("buffer", 0)]
            o = view.get("byteOffset", 0)
            data = buf[o: o + view["byteLength"]]
        else:
            uri = img_def.get("uri", "")
            if uri.startswith("data:"):
                data = base64.b64decode(uri.split(",", 1)[1])
            elif uri:
                data = open(
                    os.path.join(os.path.dirname(path), uri), "rb"
                ).read()
        img = None
        if data is not None and data[:8] == b"\x89PNG\r\n\x1a\n":
            try:
                img = _decode_png(data)
            except Exception as e:  # fall back to the factor color
                import warnings

                warnings.warn(f"PNG decode failed for image {idx}: {e}")
        elif data is not None:
            import warnings

            warnings.warn(
                f"image {idx}: unsupported format (PNG only); using "
                f"baseColorFactor"
            )
        _image_cache[idx] = img
        return img

    def base_color(prim):
        """(factor_rgb, baked_texture_image_or_None, uv_set)."""
        m = prim.get("material")
        if m is None:
            return (0.8, 0.8, 0.8), None, 0
        pbr = materials[m].get("pbrMetallicRoughness", {})
        factor = tuple(
            pbr.get("baseColorFactor", [1.0, 1.0, 1.0, 1.0])[:3]
        ) if "baseColorTexture" in pbr else tuple(
            pbr.get("baseColorFactor", [0.8, 0.8, 0.8, 1.0])[:3]
        )
        img = None
        uv_set = 0
        tex = pbr.get("baseColorTexture")
        if tex is not None:
            uv_set = tex.get("texCoord", 0)
            src = gltf["textures"][tex["index"]].get("source")
            if src is not None:
                img = _load_image(src)
        return factor, img, uv_set

    meshes_out: List[List[Mesh]] = []
    for mesh in gltf.get("meshes", []):
        prims = []
        for prim in mesh.get("primitives", []):
            if prim.get("mode", 4) != 4:
                raise ValueError("only triangle primitives supported")
            pos = _read_accessor(gltf, buffers, prim["attributes"]["POSITION"])
            if "NORMAL" in prim["attributes"]:
                nrm = _read_accessor(gltf, buffers, prim["attributes"]["NORMAL"])
            else:
                nrm = np.tile([0.0, 1.0, 0.0], (len(pos), 1))
            if "indices" in prim:
                idx = _read_accessor(gltf, buffers, prim["indices"])
                tris = idx.reshape(-1, 3).astype(np.int32)
            else:
                tris = np.arange(len(pos), dtype=np.int32).reshape(-1, 3)
            factor, img, uv_set = base_color(prim)
            if "COLOR_0" in prim["attributes"]:
                vc = _read_accessor(
                    gltf, buffers, prim["attributes"]["COLOR_0"]
                )[:, :3].astype(np.float32)
            else:
                vc = np.ones((len(pos), 3), np.float32)
            uv_key = f"TEXCOORD_{uv_set}"
            if img is not None and uv_key in prim["attributes"]:
                # bake the base-color texture to vertex colors at load
                # time (host-side bilinear): the frame path stays
                # gather-free. Subdivide first so the baked vertex
                # density reaches the texture's texel density (plane
                # interpolation then matches per-pixel sampling — see
                # mesh.subdivide_to_texel_density).
                uv = _read_accessor(
                    gltf, buffers, prim["attributes"][uv_key]
                )[:, :2]
                if texture_subdiv_texels:
                    from vrenderer_tpu.models.mesh import (
                        subdivide_to_texel_density,
                    )

                    (pos, (nrm, vc), uv, tris,
                     _achieved) = subdivide_to_texel_density(
                        pos, [nrm, vc], uv, tris, img.shape[:2],
                        target_texels=float(texture_subdiv_texels),
                        max_tris=max_subdiv_tris,
                    )  # warns with achieved texels/edge if capped
                    n = np.linalg.norm(nrm, axis=-1, keepdims=True)
                    nrm = nrm / np.maximum(n, 1e-12)
                col = np.asarray(factor, np.float32) * _sample_bilinear(
                    img, np.asarray(uv, np.float32)
                ).astype(np.float32) * np.asarray(vc, np.float32)
            else:
                col = np.tile(
                    np.asarray(factor, np.float32), (len(pos), 1)
                ) * np.asarray(vc, np.float32)
            prims.append(
                Mesh(
                    positions=jnp.asarray(pos, jnp.float32),
                    normals=jnp.asarray(nrm, jnp.float32),
                    colors=jnp.asarray(col),
                    tris=jnp.asarray(tris),
                )
            )
        meshes_out.append(prims)

    scene = Scene()
    scene_def = gltf.get("scenes", [{}])[gltf.get("scene", 0)]

    def visit(node_idx: int, parent: np.ndarray):
        node = gltf["nodes"][node_idx]
        local = _node_transform(node)
        world = np.asarray(
            math3d.affine_compose(jnp.asarray(local), jnp.asarray(parent))
        )
        if "mesh" in node:
            for prim in meshes_out[node["mesh"]]:
                scene.instances.append(
                    MeshInstance(
                        mesh=prim,
                        transform=jnp.asarray(world),
                        name=node.get("name", f"node{node_idx}"),
                    )
                )
        for child in node.get("children", []):
            visit(child, world)

    identity = np.concatenate([np.eye(3), np.zeros((1, 3))]).astype(np.float32)
    for root in scene_def.get("nodes", []):
        visit(root, identity)
    return scene
