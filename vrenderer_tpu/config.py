"""Configuration for the TPU terrain renderer.

Mirrors the reference's config tiers (SURVEY.md §5.6): the compile-time
tier (reference: TerrainPass.h:23-30) becomes static (hashable)
dataclasses baked into jit closures; the runtime-UI tier (reference
``EditorParams``, Renderer.h:34-48) becomes traced jit arguments —
``renderer.FrameParams`` — so tweaking them never recompiles.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TerrainSettings:
    """Static terrain configuration.

    Reference: TerrainPass.h:23-30 ``TerrainSettings`` enum
    (MAX_INSTANCES=4096, SURFACE_SIZE=2048, WORLD_SIZE=2048, GRID_SIZE=32)
    and QuadTree.h:67 (MAX_LODS=12).
    """

    max_instances: int = 1024
    surface_size: int = 2048
    world_size: int = 2048
    grid_size: int = 32
    max_lods: int = 12
    # Selection window halfwidth in nodes per LOD level. The CDLOD ranges
    # are exactly 4 node-widths at every level (QuadTree.cpp:234-241 with
    # node width halving per level), so a 16-node window always covers the
    # reachable set; see terrain/quadtree.py.
    select_window: int = 16
    # Texel addressing for heightmap/albedo/shadow sampling:
    # "lattice" (uv*(size-1), texel centers on the world grid — right for
    # procedural assets) or "d3d" (uv*size - 0.5 + clamp, the reference's
    # SampleLevel semantics, terrain_vs.hlsl:32 — select to pixel-diff
    # against reference captures; validated against torch grid_sample in
    # tests/test_texture_d3d.py).
    uv_mode: str = "lattice" 

    def __post_init__(self):
        # Mirrors the reference's static_assert (TerrainPass.h:30).
        assert self.world_size % self.surface_size == 0, (
            "WORLD_SIZE must be a multiple of SURFACE_SIZE"
        )
        assert self.grid_size & (self.grid_size - 1) == 0, (
            "GRID_SIZE must be a power of two"
        )

    @property
    def num_surfaces_per_side(self) -> int:
        return self.world_size // self.surface_size

    @property
    def num_lods(self) -> int:
        """numLods = min(MAX_LODS-1, log2(surface width)); QuadTree.cpp:22."""
        import math

        return min(self.max_lods - 1, int(math.log2(self.surface_size)))

    @property
    def verts_per_side(self) -> int:
        return self.grid_size + 1

    @property
    def tris_per_instance(self) -> int:
        return self.grid_size * self.grid_size * 2

    def lod_ranges(self) -> jnp.ndarray:
        """LOD visibility ranges, range[i] = 4 * 2^i (QuadTree.cpp:234-241)."""
        i = jnp.arange(self.max_lods, dtype=jnp.float32)
        return 4.0 * jnp.exp2(i)


@dataclasses.dataclass(frozen=True)
class RasterSettings:
    """Static rasterizer configuration (no reference analog: the reference
    gets rasterization from GPU hardware behind drawIndexed,
    TerrainPass.cpp:222)."""

    # Supertile size in pixels. Each supertile owns a VMEM-resident
    # z/id/attribute tile while instances binned to it are rasterized.
    tile_h: int = 128
    tile_w: int = 128
    # Fine evaluation window inside a supertile. 16 rows measured fastest
    # at 1080p on v5e (vs 8: fewer active (item, subtile) pairs and
    # compaction rounds more than offset the 2x per-round pixel sweep).
    subtile_h: int = 16
    # Subtile height for the LIGHT-VIEW depth-only raster (map-mode
    # shadow map). The depth kernel drops the winner-swap dots and 29
    # of 48 channels, so its round term is much cheaper than the main
    # kernel's and the optimum flips: halving the eval sweep beats the
    # 1.24x round count (measured on hardware at the map bench config,
    # scripts/kexp_light.py: K=32 sub_h=8 24.8 ms vs sub16 29.8,
    # sub4 33.3, K=16/sub8 32.4). Output z is bit-identical across
    # values (min-merge is order-free;
    # test_depth_kernel_z_invariant_across_subtile_h).
    light_subtile_h: int = 8
    # Batch granularity for the host-side conservative z-range metadata
    # (feeds item-level early-z bounds in the work-list builder).
    tri_batch: int = 32
    # Compaction width: per (work item, cell) the triangles touching
    # the cell are compacted into groups of this many rows via a
    # one-hot MXU matmul, then evaluated densely over the cell.
    compact_k: int = 32
    # Compaction-cell x-window width in pixels (tile_w divides by it).
    # Cells are (subtile_h x win_w) blocks. HARDWARE CONSTRAINT: Mosaic
    # only lowers the cell->tile stitch reshape when win_w is a multiple
    # of 128 (minor-dim-128 rule), so win_w < 128 runs under interpret
    # only (tests); on TPU use win_w=128 with tile_w 128/256 (wider
    # tiles cut work items; sub-128 windows would cut the eval sweep to
    # the triangles' ~16-px footprint but cannot be stitched -- see
    # docs/PERFORMANCE.md).
    win_w: int = 128
    # Two-phase rasterization: phase 1 rasters z + winner id at
    # depth-kernel cost (no swap dots, no coefficient accumulator);
    # phase 2 resolves attribute planes ONLY for (item, cell) pairs
    # whose instance won pixels (the TPU analog of fragment shading
    # behind GPU early-z, TerrainPass.cpp:222). Bit-identical output to
    # the single-phase kernel (tests/test_raster_pallas.py). Ignored
    # under wireframe (the wire cover rule needs the fused kernel).
    two_phase: bool = False
    # Interpolated vertex-attribute channels (albedo3, normal3, shadow,
    # height).
    attr_channels: int = 8
    # Reverse-z depth convention flag (reference PipelineKey bit,
    # TerrainPass.h:40, TerrainPass.cpp:478-482).
    reverse_z: bool = False
    # Wireframe fill mode (reference: RasterFillMode::Wireframe,
    # TerrainPass.cpp:311).
    wireframe: bool = False


@dataclasses.dataclass(frozen=True)
class FrameConfig:
    """Static whole-frame configuration: resolution + sub-configs."""

    width: int = 1920
    height: int = 1080
    terrain: TerrainSettings = dataclasses.field(default_factory=TerrainSettings)
    raster: RasterSettings = dataclasses.field(default_factory=RasterSettings)
    # Camera projection; reference: Renderer.cpp:315
    # (perspProjD3DStyle(60deg, aspect, 0.1, 10000)).
    vfov_degrees: float = 60.0
    z_near: float = 0.1
    z_far: float = 10000.0
    # Shadow map resolution (reference: Renderer.cpp:83, 2048, 1 cascade).
    shadow_resolution: int = 2048
    # Shadow technique: "horizon" (TPU-native horizon march with mesh-top
    # occluders + shadow-line receivers) or "map" (reference architecture:
    # light-view depth raster + filtered comparison sampling at
    # vertex-rate receivers; costs one extra raster + O(N*R^2) sampling).
    shadow_mode: str = "horizon"
    # LOD selection eye for the map-mode light-view raster:
    #   "main"  — select/morph shadow geometry from the MAIN camera, so
    #             shadow depth matches the rendered mesh exactly (no
    #             LOD-mismatch acne). This is a quality deviation from
    #             the reference and pays for it: the light raster renders
    #             the full view-LOD triangle density.
    #   "light" — reference parity: TerrainPass::Render is handed the
    #             SHADOW view and selects from ITS origin
    #             (TerrainPass.cpp:183 NodeSelect(view->GetViewOrigin()),
    #             Renderer.cpp:348 — the CSM proxy view sits ~zRange =
    #             WORLD_SIZE away along the sun), which collapses the
    #             shadow mesh to the coarsest LOD rings. Far fewer
    #             triangles in the light raster; shadow depth comes from
    #             a coarser mesh than the one rendered (the reference's
    #             actual behavior).
    shadow_select: str = "main"
    # Coarsen the light-view selection by this many LOD levels (halves
    # every CDLOD visibility ring per step, so nodes select ~bias levels
    # coarser). 0 = exactly the main pass's density. Applies on top of
    # shadow_select="main"; a middle ground between the two eyes above
    # (selection AND morph use the biased ranges, so the shadow mesh is
    # still a crack-free CDLOD surface).
    shadow_lod_bias: int = 0
    # Quantize the shadow_select="main" light-pass selection eye to this
    # world-unit grid (0 = off, exact view-matched selection per frame).
    # CDLOD selection is continuous in the eye; snapping the eye to a
    # lattice makes the whole light pass (selection, morph, raster) a
    # PIECEWISE-CONSTANT function of camera position, so the
    # view-matched shadow map becomes cacheable with EXACT invalidation
    # on cell crossings (Renderer.cached_shadow_prepass keys on the
    # cell). Within a cell, cached frames are bit-identical to inline
    # frames (tests/test_shadow_cache.py). Quality cost vs the
    # unquantized default is an eye shift of at most half a cell: the
    # LOD ring BOUNDARIES move by <= quant/2 but every ring keeps its
    # resolution (far gentler than shadow_lod_bias, which halves every
    # ring). The main render always morphs from the TRUE eye — only the
    # shadow-map pass sees the snapped eye.
    shadow_eye_quant: float = 0.0
    # Static-scene shadow-map cache: when shadow_select="light", the
    # whole-world sheared shadow map depends only on (sun, max_height,
    # scene transforms, heightmap) — not the camera — so drive loops
    # (App, bench --mode mapcache) raster it once and reuse it until one
    # of those changes (Renderer.cached_shadow_prepass). Exact: the
    # cached frame is bit-identical to the per-frame-raster frame
    # (tests/test_shadow_cache.py). The reference has no analog — its
    # CSM view is camera-fit per frame (Renderer.cpp:345-348), ours is
    # not. Under shadow_select="main" the cache applies only with
    # shadow_eye_quant > 0 (keyed on the quantized eye cell; invalidated
    # exactly on cell crossings).
    shadow_cache: bool = True

    @property
    def aspect(self) -> float:
        return self.width / self.height

    @property
    def padded_width(self) -> int:
        t = self.raster.tile_w
        return (self.width + t - 1) // t * t

    @property
    def padded_height(self) -> int:
        t = self.raster.tile_h
        return (self.height + t - 1) // t * t


@dataclasses.dataclass(frozen=True)
class LightParams:
    """Directional light; reference defaults from Renderer.cpp:135-142
    (angularSize 0.53 deg, irradiance 1.0, direction (-0.9,-0.25,0.35))."""

    direction: Tuple[float, float, float] = (-0.9, -0.25, 0.35)
    irradiance: float = 1.0
    angular_size_degrees: float = 0.53
    color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
