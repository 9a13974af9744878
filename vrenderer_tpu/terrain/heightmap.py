"""Heightmap and albedo assets.

The reference loads media/terrain_heightmap.png and terrain_albedo.png
(Renderer.cpp:51-55); those assets are not in the repo snapshot, so the
default here is a deterministic procedural heightfield (value-noise fBm)
with a slope/height-based albedo ramp. Values match the reference's
interpretation: heightmap samples are normalized [0, 1] (8-bit PNG / 255,
QuadTree.cpp:159) and scaled by EditorParams.max_height in the vertex
stage (terrain_vs.hlsl:32).

A PNG loader is provided when pillow/torch are importable, but nothing in
the framework depends on it.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _smoothstep(t: np.ndarray) -> np.ndarray:
    return t * t * (3.0 - 2.0 * t)


def _value_noise(res: int, cells: int, rng: np.random.Generator) -> np.ndarray:
    """One octave of value noise on a res x res grid (host-side, init only)."""
    lattice = rng.random((cells + 1, cells + 1), dtype=np.float32)
    # bilinear-smoothstep upsample to res
    u = np.linspace(0.0, cells, res, endpoint=False, dtype=np.float32)
    i0 = np.floor(u).astype(np.int32)
    f = _smoothstep(u - i0)
    i1 = np.minimum(i0 + 1, cells)
    rows = (
        lattice[i0][:, i0] * (1 - f)[None, :] + lattice[i0][:, i1] * f[None, :]
    )
    rows1 = (
        lattice[i1][:, i0] * (1 - f)[None, :] + lattice[i1][:, i1] * f[None, :]
    )
    return rows * (1 - f)[:, None] + rows1 * f[:, None]


def procedural_heightmap(resolution: int = 256, seed: int = 1234) -> jnp.ndarray:
    """Deterministic fBm heightfield in [0, 1], shape (res, res) f32.

    Axis convention: [v, u] = [z row, x column], matching the reference's
    uv mapping uv = (worldPos.xz + half) / worldSize (terrain_vs.hlsl:30).
    """
    h = None
    if resolution >= 1024:
        # large assets: the per-octave numpy temporaries dominate init
        # time, so the fBm loop runs in the native library when it loads
        # (native/vrt_native.cpp vrt_fbm_heightmap; same lattice-noise
        # construction, its own deterministic hash). Shaping below is
        # identical on both paths.
        from vrenderer_tpu.utils import native

        h = native.fbm_heightmap(resolution, seed=seed, octaves=32,
                                 gain=0.55)
    if h is None:
        rng = np.random.default_rng(seed)
        h = np.zeros((resolution, resolution), np.float32)
        amp, cells, total = 1.0, 4, 0.0
        while cells <= resolution // 2:
            h += amp * _value_noise(resolution, cells, rng)
            total += amp
            amp *= 0.55
            cells *= 2
        h = h / total
    # gentle shaping: ridged center falloff so the default view has relief
    yy, xx = np.meshgrid(
        np.linspace(-1, 1, resolution, dtype=np.float32),
        np.linspace(-1, 1, resolution, dtype=np.float32),
        indexing="ij",
    )
    dome = np.clip(1.0 - 0.55 * (xx * xx + yy * yy), 0.0, 1.0)
    h = np.clip(h * (0.35 + 0.65 * dome), 0.0, 1.0)
    # quantize like an 8-bit PNG (QuadTree.cpp:159 byteData/255)
    h = np.round(h * 255.0) / 255.0
    return jnp.asarray(h, jnp.float32)


def procedural_albedo(height01: jnp.ndarray) -> jnp.ndarray:
    """Albedo texture (res, res, 3) from the height field: a grass -> rock
    -> snow ramp with a little variation. Stand-in for
    media/terrain_albedo.png (Renderer.cpp:54)."""
    h = np.asarray(height01)
    grass = np.array([0.13, 0.35, 0.11], np.float32)
    rock = np.array([0.35, 0.30, 0.26], np.float32)
    snow = np.array([0.85, 0.87, 0.90], np.float32)
    t1 = np.clip((h - 0.25) / 0.35, 0.0, 1.0)[..., None]
    t2 = np.clip((h - 0.65) / 0.2, 0.0, 1.0)[..., None]
    c = grass * (1 - t1) + rock * t1
    c = c * (1 - t2) + snow * t2
    return jnp.asarray(c, jnp.float32)


def load_png(path: str) -> jnp.ndarray:
    """Optional PNG loader (returns f32 in [0,1], (H, W) or (H, W, C))."""
    try:
        from PIL import Image  # type: ignore

        img = np.asarray(Image.open(path), np.float32) / 255.0
        return jnp.asarray(img)
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "PNG loading requires pillow; use procedural_heightmap instead"
        ) from e
