"""vrenderer_tpu — a TPU-native terrain rendering framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Viictor/vrenderer (a C++20 D3D12/Vulkan CDLOD terrain renderer on NVIDIA's
Donut framework; see /root/reference and SURVEY.md):

* a tile-based software rasterizer (vertex transform, binning, z-buffered
  raster, attribute interpolation) replacing the GPU hardware rasterizer,
* a vectorized, fully jittable CDLOD quadtree terrain system (per-frame LOD
  selection, frustum culling, vertex morphing, heightmap displacement)
  replacing the recursive CPU quadtree (reference: source/terrain/),
* the deferred frame loop (shadow -> G-buffer -> deferred lighting ->
  tonemap -> sky -> blit) on HBM-resident buffers (reference:
  source/Renderer.cpp:321-446),
* a per-pass profiler whose counter names mirror the reference
  (source/profiler/), and
* multi-chip scaling of the frame via jax.sharding / shard_map
  (screen-space tiling + frame batching), which the single-GPU reference
  has no analog for.

TPU-first design notes (why this is not a port):

* The reference leans on hardware rasterization, per-pixel texture fetches
  and atomic depth test. On TPU, random gather/scatter run at ~0.15 G
  elem/s while the MXU runs at ~2e14 FLOP/s, so every stage here is
  formulated as dense matrix algebra: bilinear texture sampling is a pair
  of matmuls with interpolation matrices, rasterization is an
  [triangles x pixels] edge-function matmul followed by a min-reduce, and
  shading attributes are computed at vertices (where sampling is dense)
  and plane-interpolated by the rasterizer instead of fetched per pixel.
* Everything in the frame path has static shapes: selection uses fixed
  16x16 node windows per LOD level, instances are padded to a fixed cap
  with masks (mirroring the reference's own fixed 4096-instance buffer,
  TerrainPass.h:25), and control flow is mask-based.
"""

__version__ = "0.1.0"

from vrenderer_tpu.config import (
    TerrainSettings,
    FrameConfig,
)

__all__ = [
    "TerrainSettings",
    "FrameConfig",
    "__version__",
]
