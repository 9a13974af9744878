"""Shared terrain patch grid mesh.

The reference builds a single (GRID_SIZE+1)^2 vertex grid spanning
[-1, 1]^2 in XZ with y=0, plus an index buffer of GRID_SIZE^2 quads split
into two CCW triangles each, and draws every selected quadtree node as an
instance of it (TerrainPass.cpp:52-87). Same here, as arrays.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp


def make_grid(grid_size: int = 32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (positions (S*S, 3) f32, indices (T, 3) i32), S = grid_size+1.

    Vertex layout matches TerrainPass.cpp:57-66: row-major over
    h (z) then w (x), pos = (w/half, 0, h/half) for w, h in
    [-half, half]. Triangles match TerrainPass.cpp:68-87:
    (bl, tl, tr) and (bl, tr, br) per cell.
    """
    side = grid_size + 1
    half = grid_size // 2
    coords = np.arange(-half, half + 1, dtype=np.float32) / half
    hh, ww = np.meshgrid(coords, coords, indexing="ij")
    pos = np.stack([ww, np.zeros_like(ww), hh], axis=-1).reshape(-1, 3)

    i = np.arange(side - 1)
    j = np.arange(side - 1)
    ii, jj = np.meshgrid(i, j, indexing="ij")
    bl = ii * side + jj
    tl = (ii + 1) * side + jj
    tr = (ii + 1) * side + jj + 1
    br = ii * side + jj + 1
    tris = np.stack(
        [
            np.stack([bl, tl, tr], axis=-1),
            np.stack([bl, tr, br], axis=-1),
        ],
        axis=-2,
    ).reshape(-1, 3)
    return jnp.asarray(pos, jnp.float32), jnp.asarray(tris, jnp.int32)


def grid_uv01(grid_size: int = 32) -> jnp.ndarray:
    """Normalized [0,1] grid positions, (S, S, 2) — the VS's
    gridPos = (pos.xz + 1) / 2 (terrain_vs.hlsl:49)."""
    side = grid_size + 1
    c = jnp.linspace(0.0, 1.0, side, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(c, c, indexing="xy")
    return jnp.stack([uu, vv], axis=-1)
