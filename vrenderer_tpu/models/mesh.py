"""Triangle meshes: the scene-geometry path.

The reference renders GLTF scene meshes through Donut's GBufferFillPass
with an instanced opaque draw strategy (Renderer.cpp:384-399) alongside
the terrain. Here a mesh is a plain array bundle; scene geometry flows
through the SAME rasterizer as terrain by chunking mesh triangles into
fixed-size instance blocks (ops/raster_pallas packs per-instance blocks
of tris_per_instance triangles, so a mesh just becomes extra blocks with
validity padding).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from vrenderer_tpu.utils import math3d


class Mesh(NamedTuple):
    positions: jnp.ndarray  # (V, 3)
    normals: jnp.ndarray    # (V, 3)
    colors: jnp.ndarray     # (V, 3) linear base color
    tris: jnp.ndarray       # (T, 3) int32

    @property
    def num_tris(self) -> int:
        return self.tris.shape[0]


def cube(size: float = 1.0, color=(0.8, 0.2, 0.2)) -> Mesh:
    """Unit-ish cube, the stand-in for the reference's Cube.gltf default
    scene (main.cpp:89-95). 24 verts (split normals), 12 tris, wound so
    outward faces are front under the renderer's conventions."""
    s = size * 0.5
    faces = [
        # (normal, corners CCW seen from outside)
        ((0, 0, 1), [(-s, -s, s), (s, -s, s), (s, s, s), (-s, s, s)]),
        ((0, 0, -1), [(s, -s, -s), (-s, -s, -s), (-s, s, -s), (s, s, -s)]),
        ((1, 0, 0), [(s, -s, s), (s, -s, -s), (s, s, -s), (s, s, s)]),
        ((-1, 0, 0), [(-s, -s, -s), (-s, -s, s), (-s, s, s), (-s, s, -s)]),
        ((0, 1, 0), [(-s, s, s), (s, s, s), (s, s, -s), (-s, s, -s)]),
        ((0, -1, 0), [(-s, -s, -s), (s, -s, -s), (s, -s, s), (-s, -s, s)]),
    ]
    pos, nrm, tris = [], [], []
    for n, corners in faces:
        base = len(pos)
        pos.extend(corners)
        nrm.extend([n] * 4)
        tris.append([base, base + 1, base + 2])
        tris.append([base, base + 2, base + 3])
    pos = np.asarray(pos, np.float32)
    nrm = np.asarray(nrm, np.float32)
    col = np.tile(np.asarray(color, np.float32), (len(pos), 1))
    return Mesh(
        positions=jnp.asarray(pos),
        normals=jnp.asarray(nrm),
        colors=jnp.asarray(col),
        tris=jnp.asarray(np.asarray(tris, np.int32)),
    )


def subdivide_to_texel_density(
    pos: np.ndarray,
    attrs: list,
    uv: np.ndarray,
    tris: np.ndarray,
    tex_shape,
    target_texels: float = 1.0,
    max_tris: int = 1 << 18,
):
    """Midpoint-subdivide triangles until every edge spans at most
    ``target_texels`` texels of a (H, W) texture in UV space.

    Texture fidelity for baked-to-vertex colors (VERDICT r3 #6): the
    frame path interpolates vertex attributes by plane (gather-free), so
    a mesh matches Donut's per-pixel texture sampling (GBufferFillPass
    textured draw, Renderer.cpp:384-399) only when its vertex density
    reaches the texture's texel density — the same guarantee the terrain
    gets from its 33x33 grids (ops/vertex.py). Subdivision is UNIFORM
    per level (every triangle 4-splits) with midpoints deduplicated
    across shared edges, so no T-junction cracks can appear; it stops at
    ``target_texels``, after ``max_tris`` would be exceeded, or when no
    triangle has a UV extent above target.

    ``attrs`` is a list of (V, C) arrays carried through the split
    (normals, colors, ...); midpoints average linearly. Host-side numpy:
    runs once at load time. Returns (pos, attrs, uv, tris)."""
    pos = np.asarray(pos, np.float64)
    uv = np.asarray(uv, np.float64)
    tris = np.asarray(tris, np.int64)
    attrs = [np.asarray(a, np.float64) for a in attrs]
    H, W = int(tex_shape[0]), int(tex_shape[1])
    scale = np.asarray([W - 1, H - 1], np.float64)

    def max_edge_texels(t):
        a, b, c = uv[t[:, 0]] * scale, uv[t[:, 1]] * scale, uv[t[:, 2]] * scale
        return np.maximum(
            np.linalg.norm(a - b, axis=1),
            np.maximum(
                np.linalg.norm(b - c, axis=1),
                np.linalg.norm(c - a, axis=1),
            ),
        )

    while True:
        if len(tris) * 4 > max_tris:
            break
        if max_edge_texels(tris).max(initial=0.0) <= target_texels:
            break
        # unique undirected edges -> one midpoint vertex each
        e = np.concatenate(
            [tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]], axis=0
        )
        e_key = np.sort(e, axis=1)
        uniq, inv = np.unique(e_key, axis=0, return_inverse=True)
        base = len(pos)
        mid_ids = base + np.arange(len(uniq))
        pos = np.concatenate(
            [pos, 0.5 * (pos[uniq[:, 0]] + pos[uniq[:, 1]])]
        )
        uv = np.concatenate([uv, 0.5 * (uv[uniq[:, 0]] + uv[uniq[:, 1]])])
        attrs = [
            np.concatenate([a, 0.5 * (a[uniq[:, 0]] + a[uniq[:, 1]])])
            for a in attrs
        ]
        n = len(tris)
        m01 = mid_ids[inv[:n]]
        m12 = mid_ids[inv[n: 2 * n]]
        m20 = mid_ids[inv[2 * n:]]
        v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]
        tris = np.concatenate(
            [
                np.stack([v0, m01, m20], axis=1),
                np.stack([m01, v1, m12], axis=1),
                np.stack([m20, m12, v2], axis=1),
                np.stack([m01, m12, m20], axis=1),
            ],
            axis=0,
        )
    return pos, attrs, uv, tris


def transform_mesh(mesh: Mesh, affine: jnp.ndarray) -> Mesh:
    """Apply a (4, 3) row-vector affine (scene-graph node transform)."""
    pos = math3d.affine_apply(affine, mesh.positions)
    # Row-vector convention: p' = p @ L, so normals need n' = n @ inv(L)^T
    # (keeps n'.t' = 0 under rotation + non-uniform scale).
    lin_inv_t = jnp.linalg.inv(affine[:3, :]).T
    nrm = math3d.normalize(mesh.normals @ lin_inv_t)
    return mesh._replace(positions=pos, normals=nrm)


def mesh_to_blocks(
    mesh: Mesh,
    tris_per_block: int,
    max_height: jnp.ndarray,
    shadow_sampler=None,
    num_attrs: int = 8,
):
    """Chunk a mesh into rasterizer instance blocks.

    Returns (world (B, 3*tpb, 3), attrs (B, 3*tpb, A), tri_idx (tpb, 3),
    valid (B,)): each block carries its own 3 verts per triangle
    (deduplication across blocks isn't worth the bookkeeping at scene
    sizes), with the standard attr channel layout (ops/vertex.py):
    albedo3, normal3, shadow, height01.
    """
    T = mesh.num_tris
    tpb = tris_per_block
    nb = -(-T // tpb)
    pad = nb * tpb - T

    tri_pos = mesh.positions[mesh.tris.reshape(-1)]   # (3T, 3)
    tri_nrm = mesh.normals[mesh.tris.reshape(-1)]
    tri_col = mesh.colors[mesh.tris.reshape(-1)]

    def padv(x):
        return jnp.pad(x, [(0, 3 * pad)] + [(0, 0)] * (x.ndim - 1))

    tri_pos = padv(tri_pos).reshape(nb, 3 * tpb, 3)
    tri_nrm = padv(tri_nrm).reshape(nb, 3 * tpb, 3)
    tri_col = padv(tri_col).reshape(nb, 3 * tpb, 3)

    if shadow_sampler is None:
        shad = jnp.ones(tri_pos.shape[:2], jnp.float32)
    else:
        shad = shadow_sampler(tri_pos)
    h01 = tri_pos[..., 1] / jnp.maximum(max_height, 1e-6)
    attrs = jnp.concatenate(
        [tri_col, tri_nrm, shad[..., None], h01[..., None]], axis=-1
    )

    idx = jnp.arange(tpb * 3, dtype=jnp.int32).reshape(tpb, 3)
    # mask padded triangles by making them degenerate (all three verts 0)
    # AND marking per-vertex validity via the instance-valid path: blocks
    # are always "valid"; padded tris are degenerate -> culled by setup.
    valid = jnp.ones((nb,), bool)
    return tri_pos, attrs, idx, valid
