"""Texture sampling as dense matrix algebra (gather-free).

The reference samples textures with hardware bilinear units
(SampleLevel / Sample with a linear-clamp sampler, terrain_vs.hlsl:32,
terrain_ps.hlsl:23). On TPU, per-element gather runs at ~0.15 G elem/s
(measured on v5e) while the MXU runs matmuls at ~2e14 FLOP/s, so sampling
here is restructured:

* ``interp_matrix`` builds a bilinear interpolation operator for a 1D set
  of sample coordinates: a dense (n_samples, texels) matrix with at most
  two non-zeros per row.
* ``sample_separable`` evaluates a full 2D grid of samples
  (u x v outer product) as two matmuls: A_v @ T @ A_u^T. This is exact
  bilinear sampling with clamp addressing, and is how vertex-stage
  heightmap/albedo sampling is done (the CDLOD vertex lattice of an
  instance is an axis-aligned grid in texture space, so the sample set is
  always separable; see ops/vertex.py).
* ``sample_points`` is the exact-but-slow per-point path (XLA gather),
  kept for tests and oracles.

Texel addressing has two modes, selected by ``mode``:

* ``"lattice"`` (default): texel centers at integer coordinates under
  ``uv * (size - 1)``. One consistent convention across vertex and
  oracle paths; right for procedural assets sampled on their own
  lattice (heightmap texels ARE world-grid points).
* ``"d3d"``: the reference's hardware convention — texel centers at
  half-integers under ``uv * size - 0.5`` with clamp (border)
  addressing (SampleLevel + linear-clamp sampler, terrain_vs.hlsl:32,
  terrain_ps.hlsl:23). Identical to torch ``grid_sample`` with
  ``align_corners=False, padding_mode="border"`` (tested against it in
  tests/test_texture_d3d.py). Select per-world via
  ``TerrainSettings.uv_mode`` to pixel-diff against reference captures.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def texel_coords(u: jnp.ndarray, size: int, mode: str = "lattice"
                 ) -> jnp.ndarray:
    """uv in [0,1] -> continuous texel coordinate with clamp addressing."""
    if mode == "d3d":
        # D3D11 linear-clamp: centers at i + 0.5 under uv*size; clamping
        # the CONTINUOUS coordinate to [0, size-1] reproduces border
        # addressing for the 2-tap bilinear weights
        return jnp.clip(u * size - 0.5, 0.0, size - 1)
    assert mode == "lattice", f"unknown texel addressing mode {mode!r}"
    return jnp.clip(u, 0.0, 1.0) * (size - 1)


def interp_matrix(u: jnp.ndarray, size: int, mode: str = "lattice"
                  ) -> jnp.ndarray:
    """Bilinear weights matrix: (..., n, size) with w[i, t] the weight of
    texel t for sample u[i]. Built from a broadcasted compare, no gather.
    """
    x = texel_coords(u, size, mode)  # (..., n)
    t = jnp.arange(size, dtype=x.dtype)  # (size,)
    d = jnp.abs(x[..., :, None] - t)  # (..., n, size)
    return jnp.maximum(0.0, 1.0 - d)


def sample_separable(
    tex: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
    precision=jax.lax.Precision.HIGHEST,
    mode: str = "lattice",
) -> jnp.ndarray:
    """Sample tex at the grid (v x u) of uv coordinates.

    tex: (H, W) or (H, W, C); u: (..., nu); v: (..., nv).
    Returns (..., nv, nu) or (..., nv, nu, C). Exact bilinear w/ clamp.
    Cost: two matmuls — MXU-friendly, no gather. Default precision is
    HIGHEST: the TPU's bf16 matmul default quantizes sampled heights to
    ~0.4% (meters of terrain error and garbage central-difference
    normals); callers with tolerant channels may lower it.
    """
    H, W = tex.shape[0], tex.shape[1]
    au = interp_matrix(u, W, mode)  # (..., nu, W)
    av = interp_matrix(v, H, mode)  # (..., nv, H)
    if tex.ndim == 2:
        tmp = jnp.einsum("...vh,hw->...vw", av, tex, precision=precision)
        return jnp.einsum("...vw,...uw->...vu", tmp, au, precision=precision)
    tmp = jnp.einsum("...vh,hwc->...vwc", av, tex, precision=precision)
    return jnp.einsum("...vwc,...uw->...vuc", tmp, au, precision=precision)


def sample_points_matmul(
    tex: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
    precision=jax.lax.Precision.HIGHEST,
    mode: str = "lattice",
) -> jnp.ndarray:
    """Exact bilinear sample at arbitrary (u, v) points, gather-free.

    Unlike ``sample_separable`` the points need not form a grid: per point
    the row interpolation runs as a matmul (Av @ T) and the column
    interpolation as a row-wise weighted reduce. Cost O(n * (H + W) * W)
    MXU FLOPs — use for vertex-rate point sets (mesh vertices, world-grid
    surface points), not per-pixel sets.

    tex: (H, W) or (H, W, C); u, v: (n,). Returns (n,) or (n, C).
    """
    H, W = tex.shape[0], tex.shape[1]
    av = interp_matrix(v, H, mode)  # (n, H)
    au = interp_matrix(u, W, mode)  # (n, W)
    if tex.ndim == 2:
        tmp = jnp.matmul(av, tex, precision=precision)      # (n, W)
        return jnp.sum(tmp * au, axis=-1)
    tmp = jnp.einsum("nh,hwc->nwc", av, tex, precision=precision)
    return jnp.sum(tmp * au[..., None], axis=1)


def sample_points(tex: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                  mode: str = "lattice") -> jnp.ndarray:
    """Exact bilinear sample at arbitrary (u, v) points via gather.

    Slow on TPU — for tests/oracles and tiny point sets only.
    tex: (H, W) or (H, W, C); u, v: (...,). Returns (...,) or (..., C).
    """
    H, W = tex.shape[0], tex.shape[1]
    x = texel_coords(u, W, mode)
    y = texel_coords(v, H, mode)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    fx = (x - x0)[..., None] if tex.ndim == 3 else (x - x0)
    fy = (y - y0)[..., None] if tex.ndim == 3 else (y - y0)
    a = tex[y0, x0]
    b = tex[y0, x1]
    c = tex[y1, x0]
    d = tex[y1, x1]
    return (a * (1 - fx) + b * fx) * (1 - fy) + (c * (1 - fx) + d * fx) * fy


def world_to_uv(world_xz: jnp.ndarray, world_size: float) -> jnp.ndarray:
    """uv = (worldPos.xz + worldSize/2) / worldSize (terrain_vs.hlsl:29-30)."""
    return (world_xz + world_size * 0.5) / world_size
