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

All samplers use the reference's linear-clamp addressing with texel
centers at integer coordinates under ``uv * (size - 1)`` mapping. Note:
D3D maps uv to texel centers as uv*size - 0.5; donut's terrain textures
are sampled with clamp and low-frequency content, and the framework keeps
one consistent convention (uv*(size-1)) across vertex and oracle paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def texel_coords(u: jnp.ndarray, size: int) -> jnp.ndarray:
    """uv in [0,1] -> continuous texel coordinate with clamp addressing."""
    return jnp.clip(u, 0.0, 1.0) * (size - 1)


def interp_matrix(u: jnp.ndarray, size: int) -> jnp.ndarray:
    """Bilinear weights matrix: (..., n, size) with w[i, t] the weight of
    texel t for sample u[i]. Built from a broadcasted compare, no gather.
    """
    x = texel_coords(u, size)  # (..., n)
    t = jnp.arange(size, dtype=x.dtype)  # (size,)
    d = jnp.abs(x[..., :, None] - t)  # (..., n, size)
    return jnp.maximum(0.0, 1.0 - d)


def sample_separable(
    tex: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
    precision=jax.lax.Precision.HIGHEST,
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
    au = interp_matrix(u, W)  # (..., nu, W)
    av = interp_matrix(v, H)  # (..., nv, H)
    if tex.ndim == 2:
        tmp = jnp.einsum("...vh,hw->...vw", av, tex, precision=precision)
        return jnp.einsum("...vw,...uw->...vu", tmp, au, precision=precision)
    tmp = jnp.einsum("...vh,hwc->...vwc", av, tex, precision=precision)
    return jnp.einsum("...vwc,...uw->...vuc", tmp, au, precision=precision)


def sample_points_matmul(
    tex: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
    precision=jax.lax.Precision.HIGHEST,
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
    av = interp_matrix(v, H)  # (n, H)
    au = interp_matrix(u, W)  # (n, W)
    if tex.ndim == 2:
        tmp = jnp.matmul(av, tex, precision=precision)      # (n, W)
        return jnp.sum(tmp * au, axis=-1)
    tmp = jnp.einsum("nh,hwc->nwc", av, tex, precision=precision)
    return jnp.sum(tmp * au[..., None], axis=1)


def sample_points(tex: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Exact bilinear sample at arbitrary (u, v) points via gather.

    Slow on TPU — for tests/oracles and tiny point sets only.
    tex: (H, W) or (H, W, C); u, v: (...,). Returns (...,) or (..., C).
    """
    H, W = tex.shape[0], tex.shape[1]
    x = texel_coords(u, W)
    y = texel_coords(v, H)
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
