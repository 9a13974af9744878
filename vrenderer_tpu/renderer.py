"""Frame orchestration: the TPU equivalent of vRenderer::Renderer.

The reference records one command list per frame with the pass schedule
shadow -> G-buffer/terrain -> deferred lighting -> tonemap -> sky -> blit
(Renderer::RecordCommand, Renderer.cpp:321-446) and submits it once
(Renderer.cpp:448-454). Here the whole frame is ONE jitted function over
HBM-resident arrays: XLA fuses the image-space passes, and per-frame
"constant buffer" state (camera, EditorParams-like knobs) enters as traced
arguments so UI tweaks never recompile.

Pass map (reference counter -> here):
  Terrain Shadow   -> horizon-map shadow field (ops/shadow.py), sampled at
                      vertices; optional depth-only light-view raster for
                      parity (render_shadow_depth)
  GBuffer fill     -> (scene meshes: not part of the terrain pipeline;
                      the terrain IS the G-buffer producer, as in the
                      reference where the terrain pass writes the same
                      4 MRTs, terrain_ps.hlsl:45-82)
  Terrain          -> select -> vertex -> setup -> rasterize (z/id/attrs)
  Deferred Lighting-> ops/lighting.deferred_lighting
  ToneMapping      -> ops/lighting.tonemap
  Sky              -> ops/lighting.sky_color AFTER tonemap (quirk kept)
  Blit             -> sRGB encode (+ optional u8 pack)
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from vrenderer_tpu.config import FrameConfig, LightParams
from vrenderer_tpu.camera import Camera, make_view_constants
from vrenderer_tpu.ops import (
    lighting, raster, raster_pallas, shadow, texture, vertex,
)
from vrenderer_tpu.terrain import grid as gridmod
from vrenderer_tpu.terrain import quadtree
from vrenderer_tpu.utils import math3d


class FrameParams(NamedTuple):
    """Traced per-frame state (the EditorParams/light analog; all arrays so
    changes never recompile). Defaults mirror the reference
    (Renderer.h:34-48, Renderer.cpp:135-142)."""

    max_height: jnp.ndarray          # EditorParams.m_MaxHeight (400)
    ambient_intensity: jnp.ndarray   # EditorParams.m_AmbientIntensity (.01)
    light_direction: jnp.ndarray     # (3,)
    light_irradiance: jnp.ndarray
    light_color: jnp.ndarray         # (3,)
    exposure: jnp.ndarray
    # EditorParams.m_RenderTerrain gate (Renderer.cpp:401-415 region):
    # 0.0 skips terrain visibility — sky-only frame, no recompile.
    render_terrain: jnp.ndarray
    # EditorParams.m_DebugQuadTree analog (Renderer.cpp:481-513 draws
    # selected nodes as green cubes): 1.0 tints covered pixels by a hash
    # of their instance (quadtree node) id so node boundaries are visible.
    debug_quadtree: jnp.ndarray

    @staticmethod
    def default(light: LightParams = LightParams()) -> "FrameParams":
        return FrameParams(
            max_height=jnp.float32(400.0),
            ambient_intensity=jnp.float32(0.2),
            light_direction=jnp.asarray(light.direction, jnp.float32),
            light_irradiance=jnp.float32(light.irradiance),
            light_color=jnp.asarray(light.color, jnp.float32),
            exposure=jnp.float32(1.0),
            render_terrain=jnp.float32(1.0),
            debug_quadtree=jnp.float32(0.0),
        )


class FrameOutput(NamedTuple):
    ldr: jnp.ndarray          # (H, W, 3) sRGB-encoded in [0, 1]
    hdr: jnp.ndarray          # (H, W, 3) linear
    depth: jnp.ndarray        # (H, W) ndc z (far = +inf sentinel cleared to 1)
    prim_id: jnp.ndarray      # (H, W) int32, -1 = background
    num_instances: jnp.ndarray  # () int32 (EditorParams.m_NumChunks analog)
    num_work_items: jnp.ndarray  # () int32 raster work-list fill
    # () bool: work list or instance buffer overflowed this frame — output
    # may be missing geometry. The reference asserts instead
    # (TerrainPass.cpp:238); here it is surfaced so App/bench fail loudly.
    overflow: jnp.ndarray
    # () int32 bitmask naming WHICH capacity overflowed (1 = raster work
    # list > max_work, 2 = render budget: selection > max_active,
    # 4 = shadow-pass work list/budget) — the work-list fill being 0 while
    # the render budget overflows is otherwise unreadable from the counts
    num_selected: jnp.ndarray   # () int32 RAW selection count (uncapped)
    overflow_mask: jnp.ndarray


def overflow_message(out: "FrameOutput", renderer: "Renderer") -> str:
    """Human-readable description of WHICH capacity overflowed, with the
    overflowing buffer's own numerator (host-side; call only when
    ``out.overflow`` is set). The reference's analog is the instance-count
    assert, TerrainPass.cpp:238."""
    import numpy as np

    mask = int(np.asarray(out.overflow_mask))
    parts = []
    if mask & 1:
        parts.append(
            f"raster work list overflowed "
            f"(work items={int(out.num_work_items)} > "
            f"max_work={renderer.max_work})"
        )
    if mask & 2:
        parts.append(
            f"render budget overflowed (selected instances="
            f"{int(out.num_selected)} > max_active={renderer.max_active})"
        )
    if mask & 4:
        parts.append(
            "shadow-pass work list or render budget overflowed "
            "(light-view selection spans the whole world; raise "
            "max_active/max_work)"
        )
    msg = "; ".join(parts) if parts else "overflow flag set (unknown cause)"
    return msg + " — output may be missing geometry"


class Renderer:
    """Owns static config + assets; exposes jitted frame functions.

    raster_backend: "pallas" (TPU fast path) or "xla" (portable oracle,
    used on CPU and in tests). interpret=True runs the Pallas kernel in
    interpreter mode (CPU testing).
    """

    def __init__(
        self,
        config: FrameConfig,
        heightmap: jnp.ndarray,
        albedo: jnp.ndarray,
        light: LightParams = LightParams(),
        raster_backend: str = "pallas",
        interpret: bool = False,
        max_work: int = 2048,
        scene: Any = None,
        max_active: Optional[int] = None,
    ):
        """max_active: render-budget cap on instances per frame. Selection
        still runs at max_instances capacity, but only the first
        max_active (selection compacts valid nodes to the front) feed the
        vertex/setup/pack/raster pipeline — the TPU analog of the
        reference's drawIndexed(6144, numNodes) doing GPU work
        proportional to the SELECTED count rather than the 4096-slot
        buffer capacity (TerrainPass.cpp:215-222). Frames that select
        more than max_active raise FrameOutput.overflow."""
        self.config = config
        if heightmap is None:
            # missing-texture fallback: the reference warns and binds a
            # black texture (Renderer.cpp:58-63, TerrainPass.cpp:415-417)
            import warnings

            warnings.warn("heightmap missing; using black texture")
            heightmap = jnp.zeros((2, 2), jnp.float32)
        if albedo is None:
            albedo = jnp.zeros(heightmap.shape + (3,), jnp.float32)
        if albedo.shape[:2] != heightmap.shape:
            # the vertex stage samples albedo/normals/shadow as ONE
            # stacked texture (one separable matmul pair instead of
            # three), which requires a shared lattice — bake a
            # differently-sized albedo onto the heightmap's lattice once
            # at init (exact bilinear; static cost, off the frame path)
            Ht, Wt = heightmap.shape
            albedo = texture.sample_separable(
                albedo,
                jnp.linspace(0.0, 1.0, Wt),
                jnp.linspace(0.0, 1.0, Ht),
            )
        self.heightmap = heightmap
        self.albedo = albedo
        self.light = light
        self.raster_backend = raster_backend
        self.interpret = interpret
        self.max_work = max_work
        self.max_active = min(
            max_active or config.terrain.max_instances,
            config.terrain.max_instances,
        )
        # static per heightmap: the PS's uv±0.1 central-difference normal
        # taps (terrain_ps.hlsl:59-63) as a precomputed field
        self._nrm_field = vertex.normal_fields(self.heightmap)
        _, self.tri_indices = gridmod.make_grid(config.terrain.grid_size)
        self._prepare_scene(scene)
        self._frame_jit = jax.jit(self._frame)

    def _prepare_scene(self, scene):
        """Chunk scene meshes into raster blocks (the reference's
        'GBuffer fill' geometry, Renderer.cpp:384-399). Geometry stays
        OBJECT-space; per-instance transforms live in the mutable
        ``scene_transforms`` (N, 4, 3) array, traced as a jit argument
        and applied per frame by _scene_blocks — the analog of the
        reference's per-frame Scene::RefreshSceneGraph/RefreshBuffers
        (Renderer.cpp:204, 328-331): moving an instance is an array
        update, never a rebuild or recompile. Topology changes (add or
        remove instances) still rebuild the Renderer."""
        if scene is None or not scene.instances:
            self.scene_transforms = None
            self._scene_obj = self._scene_obj_nrm = None
            self._scene_col = self._scene_block_inst = None
            self._scene_tri_idx = None
            self._scene_top_obj = self._scene_top_vert_inst = None
            return
        from vrenderer_tpu.models import mesh as meshmod

        tpb = self.config.terrain.tris_per_instance
        objs, nrms, cols, block_inst = [], [], [], []
        tri_idx = None
        for k, inst in enumerate(scene.instances):
            w, a, tri_idx, _ = meshmod.mesh_to_blocks(
                inst.mesh, tpb, jnp.float32(400.0)
            )
            objs.append(w)
            cols.append(a[..., 0:3])
            nrms.append(a[..., 3:6])
            block_inst += [k] * w.shape[0]
        self._scene_obj = jnp.concatenate(objs)
        self._scene_obj_nrm = jnp.concatenate(nrms)
        self._scene_col = jnp.concatenate(cols)
        self._scene_block_inst = jnp.asarray(block_inst, jnp.int32)
        self._scene_tri_idx = tri_idx
        self.scene_transforms = jnp.stack(
            [jnp.asarray(i.transform, jnp.float32)
             for i in scene.instances]
        )
        # COMPACT triangle set for the horizon-mode mesh-occluder top
        # field: the raster blocks above pad each mesh to tris_per_block
        # (2048), and mesh_top_field renders through the DENSE XLA
        # oracle, whose sweep cost scales with the PADDED count — a
        # single 12-tri cube measured 24 ms/frame through the padded
        # blocks vs ~1 ms compact (round 5). Tightly pack all real
        # triangles with a per-vertex instance map instead.
        import numpy as np

        tops, top_inst = [], []
        nreal = []   # real (unpadded) triangle count per raster block
        for k, inst in enumerate(scene.instances):
            tp = np.asarray(inst.mesh.positions)[
                np.asarray(inst.mesh.tris).reshape(-1)
            ]                                         # (3T, 3)
            tops.append(tp)
            top_inst += [k] * tp.shape[0]
            T_m = inst.mesh.num_tris
            nb = -(-T_m // tpb)
            nreal += [min(tpb, T_m - j * tpb) for j in range(nb)]
        self._scene_block_nreal = nreal
        tot = np.concatenate(tops)
        n_tri = tot.shape[0] // 3
        pad = (-n_tri) % 64                           # oracle batch=64
        if pad:
            tot = np.concatenate(
                [tot, np.zeros((3 * pad, 3), np.float32)]
            )
            top_inst += [0] * (3 * pad)               # degenerate, culled
        self._scene_top_obj = jnp.asarray(tot, jnp.float32)  # (3Tc, 3)
        self._scene_top_vert_inst = jnp.asarray(top_inst, jnp.int32)

    def _scene_blocks(self, scene_xf, max_height):
        """Apply traced per-instance transforms to the object-space scene
        blocks: (world (B, V, 3), attrs (B, V, 8)). Row-vector math:
        p' = p @ L + t; normals n' = n @ inv(L)^T (rotation +
        non-uniform scale safe). The per-frame 'Scene Refresh' cost
        (Renderer.cpp:328-331) — a few thousand vertices, negligible."""
        M = scene_xf[self._scene_block_inst]          # (B, 4, 3)
        L = M[:, :3, :]
        world = (
            jnp.einsum("bvc,bcd->bvd", self._scene_obj, L)
            + M[:, 3][:, None, :]
        )
        l_inv_t = jnp.transpose(jnp.linalg.inv(L), (0, 2, 1))
        nrm = math3d.normalize(
            jnp.einsum("bvc,bcd->bvd", self._scene_obj_nrm, l_inv_t)
        )
        h01 = world[..., 1] / jnp.maximum(max_height, 1e-6)
        attrs = jnp.concatenate(
            [self._scene_col, nrm, jnp.ones_like(h01)[..., None],
             h01[..., None]], axis=-1,
        )
        return world, attrs

    def _horizon_fields(self, params: FrameParams, scene_xf):
        """Horizon-mode shadow field + shadow-line field with SCENE
        OCCLUDERS (jittable): the compact mesh-top raster (NOT the
        2048-padded raster blocks — the dense oracle's sweep pays per
        padded triangle; a 12-tri cube measured 24 ms/frame padded vs
        ~1.7 compact, round 5) feeds the horizon march as occluder
        heights, and the shadow-line field lets meshes receive."""
        from vrenderer_tpu.ops import shadow

        world_size = float(self.config.terrain.world_size)
        top_world = self._scene_top_world(scene_xf)
        mesh_top = shadow.mesh_top_field(
            top_world, jnp.ones((top_world.shape[0],), bool),
            world_size, self.heightmap.shape[0],
        )
        return shadow.horizon_shadow_field(
            self.heightmap, params.max_height, world_size,
            params.light_direction, occluder_h=mesh_top,
            with_shadow_line=True,
        )

    def horizon_shadow_prepass(self, params: Optional[FrameParams] = None):
        """Standalone (shadow_field, shadow_line) for horizon mode with a
        scene, for reuse via ``render(..., shadow_prepass=...)``. Both
        fields depend only on (sun, max_height, scene transforms,
        heightmap) — NEVER the camera — so one computation serves every
        frame until those change, with BIT-IDENTICAL results (no
        quantization; tests/test_shadow_cache.py). The reference's
        analog work (scene DepthPass into the shadow map,
        Renderer.cpp:371-379) re-renders per frame because GPU
        rasterization is free there."""
        cfg = self.config
        assert cfg.shadow_mode == "horizon"
        assert self._scene_obj is not None, (
            "the scene-less horizon field is ~0.05 ms/frame; the prepass "
            "exists for the mesh-occluder variant"
        )
        if params is None:
            params = FrameParams.default(self.light)
        if not hasattr(self, "_horizon_prepass_jit"):
            self._horizon_prepass_jit = jax.jit(self._horizon_fields)
        return self._horizon_prepass_jit(params, self.scene_transforms)

    def cached_horizon_prepass(self, params: Optional[FrameParams] = None):
        """``horizon_shadow_prepass`` memoized on (sun, max height, scene
        transforms) — the horizon twin of cached_shadow_prepass; drive
        loops call it every frame and recompute only on real changes."""
        import numpy as np

        if params is None:
            params = FrameParams.default(self.light)
        key = (
            np.asarray(params.light_direction).tobytes(),
            np.asarray(params.max_height).tobytes(),
            None if self.scene_transforms is None
            else np.asarray(self.scene_transforms).tobytes(),
        )
        cached = getattr(self, "_horizon_prepass_cache", None)
        if cached is None or cached[0] != key:
            self._horizon_prepass_cache = (
                key, self.horizon_shadow_prepass(params)
            )
        return self._horizon_prepass_cache[1]

    def _mesh_receiver_factors(self, w, point_fn):
        """Shadow factors for scene-mesh receiver vertices, computed on
        the COMPACT real-vertex prefix of each raster block (static
        slices — mesh_to_blocks pads trailing triangles, so real
        vertices are a prefix) and padded back with 1.0 for the
        degenerate tail. The per-point map sampler's cost is
        chunk-granular: feeding it the 2048-padded block vertices cost
        ~6 ms/frame for a 12-triangle cube (map-mode bench regression,
        round 5); the compact set is ~100x smaller."""
        B, V = w.shape[0], w.shape[1]
        nreal = self._scene_block_nreal
        parts = [w[b, : 3 * nreal[b]] for b in range(B)]
        f = point_fn(jnp.concatenate(parts))
        outs, o = [], 0
        for b in range(B):
            n = 3 * nreal[b]
            outs.append(jnp.pad(f[o:o + n], (0, V - n),
                                constant_values=1.0))
            o += n
        return jnp.stack(outs)

    def _scene_top_world(self, scene_xf):
        """World-space COMPACT scene triangles for mesh_top_field,
        (1, 3*Tc, 3) — the un-padded twin of _scene_blocks (see
        _prepare_scene; the dense oracle's sweep pays for padding)."""
        M = scene_xf[self._scene_top_vert_inst]       # (3Tc, 4, 3)
        world = (
            jnp.einsum("vc,vcd->vd", self._scene_top_obj, M[:, :3, :])
            + M[:, 3, :]
        )
        return world[None]

    # -- passes ------------------------------------------------------------

    def _terrain_pass(self, vc: Dict[str, jnp.ndarray], params: FrameParams,
                      shadow_field: jnp.ndarray, instances=None,
                      mesh_shadow_fn=None, band=None, scene_wa=None,
                      vout=None):
        """Select -> vertex -> setup -> rasterize. Returns raster products.
        A precomputed instance set freezes selection (lock-view).
        ``mesh_shadow_fn`` maps scene vertex positions (B, V, 3) to shadow
        factors (B, V) — how scene meshes RECEIVE shadows (the reference
        PCF-samples the shadow map for every G-buffer pixel including
        mesh pixels, Renderer.cpp:417-428).
        ``band``: optional (y0 traced, band_h static) — rasterize only the
        horizontal screen band [y0, y0+band_h) of the SAME full-frame
        projection (the sharded screen-band path; parallel/sharded.py).
        ``scene_wa``: (world, attrs) scene blocks from _scene_blocks —
        scene meshes ("GBuffer fill" geometry) ride the same raster as
        extra instance blocks."""
        cfg = self.config
        ts = cfg.terrain
        y0 = None
        out_h = cfg.height
        if band is not None:
            y0, out_h = band
            y0 = jnp.asarray(y0, jnp.float32)
        if vout is None:
            if instances is None:
                planes = math3d.frustum_planes(vc["world_to_clip"])
                instances = quadtree.select_all_surfaces(
                    ts, vc["camera_pos"], planes, ts.lod_ranges()
                )
            instances = self._clip_active(instances)
            vout = vertex.vertex_stage(
                ts, instances, vc["camera_pos"], self.heightmap,
                self.albedo, shadow_field, params.max_height,
                ts.lod_ranges(), nrm_field=self._nrm_field,
            )
        # else: precomputed (instances, vout) from the shared map-mode
        # geometry pass (VERDICT r3 #4) — instances is the light pass's
        # whole-world selection, a SUPERSET of the main-frustum selection
        # from the same eye (frustum culling only removes; LOD recursion
        # depends only on ranges), so the extra instances are exactly the
        # off-screen ones the bbox binning culls. Coverage and depth are
        # unchanged; only exact-z seam ties can re-break (instance ids
        # renumber under the superset's compaction).
        s_world = s_attrs = None
        n_scene = 0
        if scene_wa is not None:
            s_world, s_attrs = scene_wa
            n_scene = s_world.shape[0]
            if mesh_shadow_fn is not None:
                shad = mesh_shadow_fn(s_world)
                s_attrs = s_attrs.at[..., vertex.ATTR_SHADOW].set(shad)
        wire_px = 1.0 if cfg.raster.wireframe else 0.0
        if self.raster_backend == "xla":
            setup = raster.setup_triangles(
                vout.world, vout.attrs, instances.valid, self.tri_indices,
                vc["world_to_clip"], cfg.width, cfg.height,
            )
            if n_scene:
                s_setup = raster.setup_triangles(
                    s_world, s_attrs,
                    jnp.ones((n_scene,), bool), self._scene_tri_idx,
                    vc["world_to_clip"], cfg.width, cfg.height,
                )
                setup = raster.TriSetup(
                    edge=jnp.concatenate([setup.edge, s_setup.edge]),
                    planes=jnp.concatenate([setup.planes, s_setup.planes]),
                    bbox=jnp.concatenate([setup.bbox, s_setup.bbox]),
                    valid=jnp.concatenate([setup.valid, s_setup.valid]),
                )
            if band is not None:
                setup = raster.shift_setup_y(setup, y0)
                ph = -(-out_h // cfg.raster.subtile_h) * cfg.raster.subtile_h
            else:
                ph = cfg.padded_height
            z, prim_id, attrs = raster.rasterize_xla(
                setup, cfg.padded_width, ph,
                tile=(cfg.raster.subtile_h, 128),
                batch=cfg.raster.tri_batch,
                reverse_z=cfg.raster.reverse_z,
                wire_px=wire_px,
            )
            z = z[:out_h, :cfg.width]
            prim_id = prim_id[:out_h, :cfg.width]
            attrs = attrs[:out_h, :cfg.width]
        else:
            packed, bbox, usable, dist = self._packed_geometry(
                vout.world, vout.attrs, instances.valid,
                vc["world_to_clip"], cfg.width, cfg.height,
                scene_wa=None if n_scene == 0 else (s_world, s_attrs),
                y0=y0,
            )
            work = raster_pallas.build_work_list(
                bbox, usable, cfg.width, out_h,
                tile=cfg.raster.tile_w,
                tris_per_inst=ts.tris_per_instance,
                max_work=self.max_work,
                order_key=dist,
                packed=packed,
                sub_h=cfg.raster.subtile_h,
                compact_k=cfg.raster.compact_k,
                win_w=cfg.raster.win_w,
            )
            if cfg.raster.two_phase and wire_px == 0.0:
                z, prim_id, attrs, _ = (
                    raster_pallas.rasterize_pallas_two_phase(
                        packed, work, cfg.width, out_h,
                        tile=cfg.raster.tile_w,
                        sub_h=cfg.raster.subtile_h,
                        compact_k=cfg.raster.compact_k,
                        win_w=cfg.raster.win_w,
                        reverse_z=cfg.raster.reverse_z,
                        max_work=self.max_work,
                        interpret=self.interpret,
                    )
                )
            else:
                z, prim_id, attrs, _ = raster_pallas.rasterize_pallas(
                    packed, work, cfg.width, out_h,
                    tile=cfg.raster.tile_w, sub_h=cfg.raster.subtile_h,
                    compact_k=cfg.raster.compact_k,
                    win_w=cfg.raster.win_w,
                    reverse_z=cfg.raster.reverse_z,
                    max_work=self.max_work,
                    interpret=self.interpret,
                    wire_px=wire_px,
                )
            return z, prim_id, attrs, instances, work.num_items
        return z, prim_id, attrs, instances, jnp.int32(0)

    def _clip_active(self, instances):
        """Slice selection output to the render budget (selection packs
        valid nodes to the front, so a prefix slice is exact)."""
        ia = self.max_active
        if ia >= instances.valid.shape[0]:
            return instances
        return quadtree.SelectedInstances(
            position=instances.position[:ia],
            extents=instances.extents[:ia],
            lod=instances.lod[:ia],
            valid=instances.valid[:ia],
            count=instances.count,
        )

    def _packed_geometry(self, world, attrs, inst_valid, wtc, width, height,
                         scene_wa=None, y0=None):
        """Fused component-form setup + pack for terrain (+ scene blocks):
        PackedTris, instance bbox, usable mask, camera distance. Never
        materializes a stacked TriSetup (see raster.TriComponents).

        y0 (traced, optional): rebase all screen-space coefficients to a
        horizontal band starting at global row y0 (the sharded screen-band
        path); width/height stay the FULL frame for the viewport mapping.
        """
        cfg = self.config

        def one(world_, attrs_, valid_, tri_idx):
            comp = raster.setup_components(
                world_, attrs_, valid_, tri_idx, wtc, width, height,
            )
            bbox, usable, dist = raster_pallas.instance_bbox_components(
                comp, width, height, valid_,
            )
            if y0 is not None:
                bbox = bbox.at[:, 1].add(-y0)
                bbox = bbox.at[:, 3].add(-y0)
                comp = raster.shift_components_y(comp, y0)
            packed = raster_pallas.pack_components(
                comp, tri_batch=cfg.raster.tri_batch
            )
            return packed, bbox, usable, dist

        packed, bbox, usable, dist = one(
            world, attrs, inst_valid, self.tri_indices
        )
        if scene_wa is not None:
            s_world, s_attrs = scene_wa
            n_scene = s_world.shape[0]
            s_packed, s_bbox, s_usable, s_dist = one(
                s_world, s_attrs, jnp.ones((n_scene,), bool),
                self._scene_tri_idx,
            )
            packed = raster_pallas.PackedTris(
                tri_data=jnp.concatenate([packed.tri_data, s_packed.tri_data]),
                tri_cols=jnp.concatenate([packed.tri_cols, s_packed.tri_cols]),
                batch_meta=jnp.concatenate(
                    [packed.batch_meta, s_packed.batch_meta]
                ),
            )
            bbox = jnp.concatenate([bbox, s_bbox])
            usable = jnp.concatenate([usable, s_usable])
            dist = jnp.concatenate([dist, s_dist])
        return packed, bbox, usable, dist

    def _view_rays(self, vc: Dict[str, jnp.ndarray], band=None):
        """Unit world-space rays through every pixel (for sky + specular).
        band=(y0, band_h): rays for the band's rows of the full frame."""
        cfg = self.config
        x = (jnp.arange(cfg.width, dtype=jnp.float32) + 0.5) / cfg.width
        if band is not None:
            y0, band_h = band
            y = (jnp.arange(band_h, dtype=jnp.float32) + 0.5
                 + jnp.asarray(y0, jnp.float32)) / cfg.height
        else:
            y = (jnp.arange(cfg.height, dtype=jnp.float32) + 0.5) / cfg.height
        ndc_x = x * 2.0 - 1.0
        ndc_y = 1.0 - y * 2.0
        xx, yy = jnp.meshgrid(ndc_x, ndc_y, indexing="xy")
        # unproject at the far plane: clip = (x, y, 1, 1) * w_far.
        # HIGHEST precision: the inverse view-projection has huge entries
        # and the default bf16 MXU pass rounds some pixels' w to zero
        # (NaN rays on hardware, found by driving the app)
        clip = jnp.stack([xx, yy, jnp.ones_like(xx), jnp.ones_like(xx)], -1)
        m = vc["clip_to_world"]
        wpos = jnp.matmul(clip, m, precision=jax.lax.Precision.HIGHEST)
        wpos = wpos[..., :3] / wpos[..., 3:4]
        return math3d.normalize(wpos - vc["camera_pos"])

    # -- frame -------------------------------------------------------------

    def _frame(self, camera: Camera, params: FrameParams,
               scene_xf=None) -> FrameOutput:
        return self._frame_impl(camera, params, None, scene_xf=scene_xf)

    def _frame_with_instances(self, camera: Camera, params: FrameParams,
                              instances, scene_xf=None) -> FrameOutput:
        return self._frame_impl(camera, params, instances,
                                scene_xf=scene_xf)

    def _frame_adaptive(self, camera: Camera, params: FrameParams,
                        adapted_lum: jnp.ndarray, dt: jnp.ndarray,
                        scene_xf=None):
        """Frame with eye adaptation: returns (FrameOutput, new_adapted_lum).
        Reference: tonemap auto-exposure advanced per frame
        (m_ToneMappingPass->AdvanceFrame(seconds), Renderer.cpp:188-189)."""
        return self._frame_impl(camera, params, None,
                                adapt=(adapted_lum, dt),
                                scene_xf=scene_xf)

    def _frame_impl(self, camera: Camera, params: FrameParams,
                    lock_instances, adapt=None, band=None, axis_name=None,
                    scene_xf=None, shadow_prepass=None):
        """The one frame path (reference: the single RecordCommand,
        Renderer.cpp:321-446). ``band=(y0, band_h)`` renders only a
        horizontal screen band of the same frame — the sharded path calls
        THIS function per device, so every feature (scene meshes, both
        shadow modes, params gates, adaptation) behaves identically to
        the single-chip frame. ``axis_name``: mesh axis to psum image
        reductions (eye adaptation) over when banded. ``scene_xf``:
        traced per-instance scene transforms; defaults to the renderer's
        current scene_transforms. ``shadow_prepass``: a precomputed
        map-mode light-pass result (the tuple ``shadow_prepass()``
        returns) — the whole-world sheared shadow map is
        camera-independent under ``shadow_select="light"``, so callers
        may raster it ONCE and reuse it until the sun or the scene
        moves (``cached_shadow_prepass``); the in-frame light raster is
        then skipped. The reference cannot do this: its CSM shadow view
        is fit to the main camera per frame (SetupForPlanarViewStable,
        Renderer.cpp:345-348)."""
        cfg = self.config
        vc = make_view_constants(
            camera, cfg.width, cfg.height, cfg.vfov_degrees,
            cfg.z_near, cfg.z_far,
        )

        # "Scene Refresh" (Renderer.cpp:328-331): object-space scene
        # blocks -> world via the traced transforms, every frame
        scene_wa = None
        if self._scene_obj is not None:
            if scene_xf is None:
                scene_xf = self.scene_transforms
            scene_wa = self._scene_blocks(scene_xf, params.max_height)

        # "Terrain Shadow" phase: shadow field over the world + mesh
        # receiver factors. Two modes (cfg.shadow_mode):
        #   "horizon" (default, TPU-native): horizon march over
        #     max(terrain, mesh-top) occluders; meshes receive via the
        #     shadow-line field.
        #   "map" (reference architecture, Renderer.cpp:333-428): Pallas
        #     depth-only light-view raster of terrain+meshes, then
        #     filtered comparison sampling (PCF analog) at vertex-rate
        #     receiver points.
        world_size = float(cfg.terrain.world_size)
        mesh_shadow_fn = None
        shadow_overflow = jnp.int32(0)
        shared_vout = shared_instances = None
        if cfg.shadow_mode == "map" and shadow_prepass is not None:
            # cached whole-world shadow map (see docstring): the light
            # raster already ran outside the frame; geometry sharing
            # does not apply (the cache is only valid for the
            # camera-independent shadow_select="light" selection, where
            # sharing is disabled anyway)
            (depth_map, wtc_l, z_range, shadow_overflow,
             shear) = shadow_prepass
            shadow_field = self.shadow_field_from_map(
                depth_map, shear, params
            )
            if scene_wa is not None:
                def mesh_shadow_fn(w):
                    return self._mesh_receiver_factors(
                        w, lambda pts: shadow.shadow_factors_from_map(
                            depth_map, wtc_l, z_range, pts
                        )
                    )
        elif cfg.shadow_mode == "map":
            # share selection + vertex geometry with the main pass
            # (VERDICT r3 #4): the light pass's whole-world selection is
            # a superset of the main-frustum selection from the same eye,
            # so the main raster consumes the SAME geometry (its bbox
            # binning culls the off-screen extras) and only the attribute
            # phase — which needs the shadow field this pass produces —
            # runs separately (vertex.vertex_attrs). lock-view keeps its
            # own frozen main selection, so sharing is skipped there.
            # sharing requires the light selection to be a same-eye,
            # same-ranges superset of the main selection; a coarsened
            # light selection (shadow_select="light" / shadow_lod_bias)
            # is DIFFERENT geometry, so each pass selects its own
            # quantized-eye selection (shadow_eye_quant) morphs from the
            # SNAPPED eye; the main view must morph from the true eye or
            # geometry pops on cell crossings — no sharing there either
            share = (
                lock_instances is None
                and cfg.shadow_select == "main"
                and cfg.shadow_lod_bias == 0
                and cfg.shadow_eye_quant == 0.0
            )
            out_l = self._light_depth_pass(
                params, vc["camera_pos"], scene_wa=scene_wa,
                return_geom=share,
            )
            if share:
                (depth_map, wtc_l, z_range, shadow_overflow, shear,
                 shared_instances, geom_l) = out_l
                # The superset claim holds for COVERAGE, but the
                # whole-world extras are poison for the work list: the
                # clipless setup gives w<=0 triangles conservative
                # full-screen bboxes, so every instance behind the main
                # camera fans out to ~every supertile (measured: 6295
                # work items vs 2048 capacity at the map bench config —
                # truncation then punched 12% coverage holes in the
                # hardware golden; a conservative AABB-frustum mask
                # still left 3.4x the unshared work because tall boxes
                # beside/behind the camera pass it,
                # scripts/probe_sharemask.py). So run the MAIN-frustum
                # selection too — it is ~0.02 ms, the sharing win is
                # the vertex stage — and keep exactly its node set by
                # membership: light slot i survives iff its (x, z, lod)
                # node appears in the main selection. Node positions
                # are computed by the identical formula in both
                # selections, so f32 equality is exact; the main-pass
                # instance set is then THE unshared selection by
                # construction (same work list, same semantics incl.
                # the not-frustum-tested quirk emissions), only packed
                # in the light selection's slot order (prim-id
                # renumbering — the already-documented seam-tie
                # deviation).
                planes_m = math3d.frustum_planes(vc["world_to_clip"])
                inst_m = self._clip_active(quadtree.select_all_surfaces(
                    cfg.terrain, vc["camera_pos"], planes_m,
                    cfg.terrain.lod_ranges(),
                ))
                same = (
                    (shared_instances.position[:, None, 0]
                     == inst_m.position[None, :, 0])
                    & (shared_instances.position[:, None, 2]
                       == inst_m.position[None, :, 2])
                    & (shared_instances.lod[:, None]
                       == inst_m.lod[None, :])
                    & inst_m.valid[None, :]
                )
                shared_instances = quadtree.SelectedInstances(
                    position=shared_instances.position,
                    extents=shared_instances.extents,
                    lod=shared_instances.lod,
                    valid=shared_instances.valid & same.any(axis=1),
                    count=shared_instances.count,
                )
            else:
                (depth_map, wtc_l, z_range, shadow_overflow,
                 shear) = out_l
            shadow_field = self.shadow_field_from_map(
                depth_map, shear, params
            )
            if share:
                shared_vout = vertex.VertexOutput(
                    world=geom_l.world,
                    attrs=vertex.vertex_attrs(
                        cfg.terrain, geom_l, self.albedo, shadow_field,
                        self._nrm_field,
                    ),
                )
            if scene_wa is not None:
                def mesh_shadow_fn(w):
                    return self._mesh_receiver_factors(
                        w, lambda pts: shadow.shadow_factors_from_map(
                            depth_map, wtc_l, z_range, pts
                        )
                    )
        elif scene_wa is not None:
            if shadow_prepass is not None:
                # cached horizon fields (static-scene EXACT: the field
                # and shadow line depend only on (sun, max_height, scene
                # transforms, heightmap) — never the camera — so drive
                # loops compute them once; bit-identical frames,
                # tests/test_shadow_cache.py)
                shadow_field, sline = shadow_prepass
            else:
                shadow_field, sline = self._horizon_fields(
                    params,
                    scene_xf if scene_xf is not None
                    else self.scene_transforms,
                )

            def mesh_shadow_fn(w):
                def factors(pts):
                    u = texture.world_to_uv(pts[:, 0], world_size)
                    v = texture.world_to_uv(pts[:, 2], world_size)
                    s_at = texture.sample_points_matmul(sline, u, v)
                    return shadow.shadow_line_factor(pts[:, 1], s_at)

                return self._mesh_receiver_factors(w, factors)
        else:
            shadow_field = shadow.horizon_shadow_field(
                self.heightmap, params.max_height, world_size,
                params.light_direction,
            )

        # "Terrain": geometry + visibility + interpolated G-buffer attrs
        z, prim_id, attrs, instances, n_work = self._terrain_pass(
            vc, params, shadow_field,
            shared_instances if lock_instances is None else lock_instances,
            mesh_shadow_fn=mesh_shadow_fn, band=band, scene_wa=scene_wa,
            vout=shared_vout,
        )
        covered = (prim_id >= 0) & (params.render_terrain > 0.5)

        albedo = attrs[..., vertex.ATTR_ALBEDO]
        normal = attrs[..., vertex.ATTR_NORMAL]
        shadow_px = jnp.clip(attrs[..., vertex.ATTR_SHADOW], 0.0, 1.0)

        rays = self._view_rays(vc, band=band)

        # "Deferred Lighting"
        hdr = lighting.deferred_lighting(
            albedo, normal, shadow_px, covered, -rays,
            params.light_direction, params.light_irradiance,
            params.light_color, params.ambient_intensity,
        )

        # "ToneMapping" (with optional eye adaptation carry)
        exposure = params.exposure
        new_adapted = None
        if adapt is not None:
            adapted_lum, dt = adapt
            new_adapted, scale = lighting.adapt_exposure(
                hdr, covered, adapted_lum, dt, axis_name=axis_name
            )
            exposure = exposure * scale
        ldr_linear = lighting.tonemap(hdr, exposure)

        # "Sky" — after tonemap, depth-tested (Renderer.cpp:430-439)
        sky = lighting.sky_color(rays, params.light_direction)
        ldr_linear = jnp.where(covered[..., None], ldr_linear, sky)

        # quadtree debug overlay: tint covered pixels by a node-id hash
        # (green/red cube analog, Renderer.cpp:481-513); table-free so no
        # per-pixel gather
        inst_px = (prim_id // cfg.terrain.tris_per_instance).astype(
            jnp.float32
        )
        tint = jnp.stack([
            0.5 + 0.5 * jnp.sin(inst_px * 12.9898),
            0.5 + 0.5 * jnp.sin(inst_px * 78.233 + 1.3),
            0.5 + 0.5 * jnp.sin(inst_px * 37.719 + 2.6),
        ], axis=-1)
        dbg = params.debug_quadtree * covered[..., None].astype(jnp.float32)
        ldr_linear = ldr_linear * (1.0 - 0.5 * dbg) + tint * (0.5 * dbg)

        # "Blit": sRGB encode into the LdrColor-equivalent
        ldr = lighting.srgb_encode(ldr_linear)

        depth = jnp.where(covered, z, 1.0)
        out = FrameOutput(
            ldr=ldr, hdr=hdr, depth=depth, prim_id=prim_id,
            num_instances=jnp.minimum(
                instances.count, cfg.terrain.max_instances
            ),
            num_work_items=n_work,
            overflow=(
                (n_work > self.max_work)
                | (instances.count > self.max_active)
                | (shadow_overflow > 0)
            ),
            num_selected=instances.count,
            overflow_mask=(
                (n_work > self.max_work).astype(jnp.int32)
                + 2 * (instances.count > self.max_active).astype(jnp.int32)
                + 4 * (shadow_overflow > 0).astype(jnp.int32)
            ),
        )
        if adapt is not None:
            return out, new_adapted
        return out

    def render(self, camera: Camera, params: Optional[FrameParams] = None,
               shadow_prepass=None) -> FrameOutput:
        if params is None:
            params = FrameParams.default(self.light)
        # scene_transforms ride as a traced jit ARGUMENT (None when no
        # scene): editing them re-renders without recompiling
        if shadow_prepass is not None:
            if not hasattr(self, "_frame_prepass_jit"):
                self._frame_prepass_jit = jax.jit(
                    lambda c, p, xf, sp: self._frame_impl(
                        c, p, None, scene_xf=xf, shadow_prepass=sp
                    )
                )
            return self._frame_prepass_jit(
                camera, params, self.scene_transforms, shadow_prepass
            )
        return self._frame_jit(camera, params, self.scene_transforms)

    def render_adaptive(self, camera: Camera, params: FrameParams,
                        adapted_lum, dt, instances=None,
                        shadow_prepass=None):
        """Render with eye adaptation; thread the returned adapted
        luminance into the next call (seed: lighting.adapt_exposure's
        clamp midpoint, e.g. 0.5). Returns (FrameOutput, adapted_lum).
        ``instances``: optional frozen selection (lock-view) — adaptation
        and lock compose, as every Animate feature does in the
        reference's single loop (Renderer.cpp:188-204)."""
        if instances is not None:
            if not hasattr(self, "_frame_adaptive_locked_jit"):
                self._frame_adaptive_locked_jit = jax.jit(
                    lambda c, p, i, a, d, xf: self._frame_impl(
                        c, p, i, adapt=(a, d), scene_xf=xf
                    )
                )
            return self._frame_adaptive_locked_jit(
                camera, params, instances,
                jnp.float32(adapted_lum), jnp.float32(dt),
                self.scene_transforms,
            )
        if shadow_prepass is not None:
            if not hasattr(self, "_frame_adaptive_prepass_jit"):
                self._frame_adaptive_prepass_jit = jax.jit(
                    lambda c, p, a, d, xf, sp: self._frame_impl(
                        c, p, None, adapt=(a, d), scene_xf=xf,
                        shadow_prepass=sp,
                    )
                )
            return self._frame_adaptive_prepass_jit(
                camera, params, jnp.float32(adapted_lum),
                jnp.float32(dt), self.scene_transforms, shadow_prepass,
            )
        if not hasattr(self, "_frame_adaptive_jit"):
            self._frame_adaptive_jit = jax.jit(self._frame_adaptive)
        return self._frame_adaptive_jit(
            camera, params, jnp.float32(adapted_lum), jnp.float32(dt),
            self.scene_transforms,
        )

    # -- editor-parity APIs -------------------------------------------------

    def select(self, camera: Camera):
        """Run LOD selection only (for lock-view workflows and debug).
        Reference: EditorParams.m_LockView freezes selection while the
        camera moves (TerrainPass.cpp:173,192-197)."""
        cfg = self.config
        vc = make_view_constants(
            camera, cfg.width, cfg.height, cfg.vfov_degrees,
            cfg.z_near, cfg.z_far,
        )
        planes = math3d.frustum_planes(vc["world_to_clip"])
        return quadtree.select_all_surfaces(
            cfg.terrain, vc["camera_pos"], planes, cfg.terrain.lod_ranges()
        )

    def debug_selection(self, camera: Camera):
        """Per-level selected/culled masks — the headless analog of the
        reference's green/red quadtree debug cubes (Renderer.cpp:481-513).
        Single-surface worlds only (the debug view matches)."""
        cfg = self.config
        vc = make_view_constants(
            camera, cfg.width, cfg.height, cfg.vfov_degrees,
            cfg.z_near, cfg.z_far,
        )
        planes = math3d.frustum_planes(vc["world_to_clip"])
        _, debug = quadtree.select_nodes(
            cfg.terrain, vc["camera_pos"], planes, cfg.terrain.lod_ranges()
        )
        return debug

    def render_locked(self, camera: Camera, params: FrameParams,
                      instances) -> FrameOutput:
        """Render with a frozen instance set (lock-view): the camera moves
        but LOD selection stays fixed."""
        if not hasattr(self, "_frame_locked_jit"):
            self._frame_locked_jit = jax.jit(self._frame_with_instances)
        return self._frame_locked_jit(camera, params, instances,
                                      self.scene_transforms)

    def reload_pipelines(self):
        """Shader-hot-reload analog (reference: m_ShaderReoladRequested ->
        ClearCache + rebuild passes, Renderer.cpp:226-231): drops all
        compiled executables so the next frame retraces/recompiles."""
        jax.clear_caches()
        self._frame_jit = jax.jit(self._frame)
        if hasattr(self, "_frame_locked_jit"):
            del self._frame_locked_jit

    # -- shadow-map fill pass (reference "Terrain Shadow" counter) ---------

    def shadow_field_from_map(self, depth_map, shear, params):
        """Terrain shadow factors from a sheared light-view depth map:
        slab-blend separable sampling (shadow.factors_from_sun_shear_map)
        replaces per-point sampling — measured ~25x cheaper at
        2048^2 map / 256^2 receivers. One implementation for the frame
        AND the profiler's "Cascade ShadowMap" counter (App
        profile_passes), so the measured phase is the rendered one."""
        s0 = shadow.shear_map_heights(depth_map, depth_map < 2.0)
        return shadow.factors_from_sun_shear_map(
            s0, self.heightmap, params.max_height,
            float(self.config.terrain.world_size),
            *shear, -params.light_direction[1],
        )

    def _light_select(self, params: FrameParams, wtc,
                      camera_pos: Optional[jnp.ndarray] = None):
        """Light-view LOD selection (instances, sel_eye, sel_ranges),
        culled by the light frustum of ``wtc``. The selection eye and
        ranges follow cfg.shadow_select / cfg.shadow_lod_bias (see
        _light_depth_pass); jittable."""
        cfg = self.config
        ts = cfg.terrain
        planes = math3d.frustum_planes(wtc)
        if camera_pos is None:
            camera_pos = jnp.array([0.0, 1.0, 0.0], jnp.float32) \
                * params.max_height
        sel_eye = camera_pos
        if cfg.shadow_select == "main" and cfg.shadow_eye_quant > 0.0:
            # snap the selection eye to the quant lattice (cell centers):
            # the light pass becomes piecewise-constant in camera
            # position, enabling the exact quantized-eye shadow cache
            # (config.FrameConfig.shadow_eye_quant)
            q = jnp.float32(cfg.shadow_eye_quant)
            sel_eye = (jnp.floor(sel_eye / q) + 0.5) * q
        sel_ranges = ts.lod_ranges()
        if cfg.shadow_select == "light":
            # the CSM proxy eye: world-center ground point backed off
            # one WORLD_SIZE along the sun (the reference's
            # maxShadowDistance/zRange, Renderer.cpp:345-348)
            ldir = math3d.normalize(params.light_direction)
            sel_eye = -ldir * jnp.float32(float(ts.world_size))
        if cfg.shadow_lod_bias:
            sel_ranges = sel_ranges * jnp.float32(
                0.5 ** cfg.shadow_lod_bias
            )
        instances = quadtree.select_all_surfaces(
            ts, sel_eye, planes, sel_ranges
        )
        return self._clip_active(instances), sel_eye, sel_ranges

    def _light_depth_pass(self, params: FrameParams,
                          camera_pos: Optional[jnp.ndarray] = None,
                          scene_wa=None, return_geom: bool = False):
        """Depth-only raster of terrain + scene meshes along the sun's
        rays on the Pallas kernel — the reference's shadow phase
        (TerrainPass depth-only, Renderer.cpp:354-367, plus the scene
        DepthPass, :371-379), using the sun-ray-aligned SHEARED
        projection (shadow.sun_shear_matrices) so terrain receivers can
        sample the map separably. Jittable; used by shadow_mode="map"
        and render_shadow_depth. Returns (depth (R, R) z01, world->clip,
        z_range meters, overflow flag, (kx, kz, span_x, span_z)).

        The overflow flag covers BOTH shadow-pass capacity limits: the
        raster work list (> max_work) and the render budget — the light
        frustum spans the whole world, so its selection can exceed
        max_active even when the main camera's does not; truncating it
        would silently drop occluders (holes of missing shadow), so it
        is surfaced exactly like the main pass's budget overflow.

        LOD selection runs from the MAIN camera position by default
        (cfg.shadow_select="main"), so shadow geometry matches view
        geometry (no LOD-mismatch acne); the light frustum still culls.
        cfg.shadow_select="light" instead selects (and morphs) from the
        shadow view's own distant eye, the reference's actual behavior
        (TerrainPass.cpp:183 NodeSelect(view->GetViewOrigin()) with the
        CSM proxy view, Renderer.cpp:348): everything collapses to the
        coarsest LOD rings — far cheaper, coarser shadow depth.
        cfg.shadow_lod_bias coarsens the main-eye selection by N levels
        (ranges halve per step; selection and morph stay consistent).
        """
        cfg = self.config
        ts = cfg.terrain
        res = cfg.shadow_resolution
        wtc, s_kx, s_kz, s_spx, s_spz = shadow.sun_shear_matrices(
            params.light_direction, float(ts.world_size),
            params.max_height, res,
        )
        shear = (s_kx, s_kz, s_spx, s_spz)
        z_range = shadow._SHEAR_FAR - 1.0
        instances, sel_eye, sel_ranges = self._light_select(
            params, wtc, camera_pos
        )
        # geometry only: the depth raster never reads attribute planes,
        # so attrs are constant zeros (XLA folds their setup/pack away).
        # The geometry is shared with the main pass in map mode
        # (return_geom) — its attrs are computed later, once the shadow
        # field this depth map produces exists (vertex.vertex_attrs).
        geom = vertex.vertex_geometry(
            ts, instances, sel_eye, self.heightmap, params.max_height,
            sel_ranges,
        )
        vout = vertex.VertexOutput(
            world=geom.world,
            attrs=jnp.zeros(geom.world.shape[:3] + (vertex.NUM_ATTRS,),
                            jnp.float32),
        )
        if self.raster_backend == "xla":
            setup = raster.setup_triangles(
                vout.world, vout.attrs, instances.valid, self.tri_indices,
                wtc, res, res,
            )
            if scene_wa is not None:
                s_world, s_attrs = scene_wa
                n_scene = s_world.shape[0]
                s_setup = raster.setup_triangles(
                    s_world, s_attrs,
                    jnp.ones((n_scene,), bool), self._scene_tri_idx,
                    wtc, res, res,
                )
                setup = raster.TriSetup(
                    edge=jnp.concatenate([setup.edge, s_setup.edge]),
                    planes=jnp.concatenate([setup.planes, s_setup.planes]),
                    bbox=jnp.concatenate([setup.bbox, s_setup.bbox]),
                    valid=jnp.concatenate([setup.valid, s_setup.valid]),
                )
            z, _, _ = raster.rasterize_xla(setup, res, res)
            ovf = (instances.count > self.max_active).astype(jnp.int32)
            if return_geom:
                return z, wtc, z_range, ovf, shear, instances, geom
            return z, wtc, z_range, ovf, shear
        packed, bbox, usable, dist = self._packed_geometry(
            vout.world, vout.attrs, instances.valid, wtc, res, res,
            scene_wa=scene_wa,
        )
        # the depth-only kernel's round/eval balance flips the subtile
        # optimum (config.RasterSettings.light_subtile_h)
        sub_l = cfg.raster.light_subtile_h
        work = raster_pallas.build_work_list(
            bbox, usable, res, res, tile=cfg.raster.tile_w,
            tris_per_inst=ts.tris_per_instance, max_work=self.max_work,
            order_key=dist, packed=packed, sub_h=sub_l,
            compact_k=cfg.raster.compact_k,
            win_w=cfg.raster.win_w,
        )
        z = raster_pallas.rasterize_pallas_depth(
            packed, work, res, res, tile=cfg.raster.tile_w,
            sub_h=sub_l, compact_k=cfg.raster.compact_k,
            win_w=cfg.raster.win_w,
            max_work=self.max_work, interpret=self.interpret,
        )
        ovf = (
            (work.num_items > self.max_work)
            | (instances.count > self.max_active)
        ).astype(jnp.int32)
        if return_geom:
            return z, wtc, z_range, ovf, shear, instances, geom
        return z, wtc, z_range, ovf, shear

    def shadow_prepass(self, params: Optional[FrameParams] = None,
                       camera_pos: Optional[jnp.ndarray] = None):
        """Run the map-mode light pass standalone and return its result
        tuple (depth_map, world_to_clip, z_range, overflow, shear) for
        reuse via ``render(..., shadow_prepass=...)``.

        Meaningful under ``shadow_select="light"`` (the selection eye is
        the CSM proxy origin, a pure function of the sun, so the pass
        depends only on (sun, max_height, scene transforms, heightmap) —
        NOT the camera) or under ``shadow_select="main"`` with
        ``shadow_eye_quant > 0`` and ``camera_pos`` given (the selection
        eye snaps to the quant lattice, so the pass is piecewise-constant
        in the camera and one raster serves every frame inside the
        cell). The reference re-renders its shadow map every frame
        because its shadow view is camera-fit (Renderer.cpp:345-348);
        the whole-world sheared projection has no such dependence, which
        makes both cache variants exact (tests/test_shadow_cache.py
        asserts bit-equality with the in-frame pass)."""
        cfg = self.config
        assert cfg.shadow_mode == "map", "shadow_prepass needs map mode"
        quant_main = (
            cfg.shadow_select == "main" and cfg.shadow_eye_quant > 0.0
            and camera_pos is not None
        )
        assert cfg.shadow_select == "light" or quant_main, (
            "the cached shadow map needs shadow_select='light' or "
            "shadow_select='main' with shadow_eye_quant > 0 and a "
            "camera_pos (exact per-frame main-eye selection tracks the "
            "camera continuously)"
        )
        if params is None:
            params = FrameParams.default(self.light)
        if not hasattr(self, "_shadow_prepass_jit"):
            def prepass(p, xf, cam):
                wa = None
                if self._scene_obj is not None:
                    wa = self._scene_blocks(xf, p.max_height)
                return self._light_depth_pass(p, cam, scene_wa=wa)

            self._shadow_prepass_jit = jax.jit(prepass)
        return self._shadow_prepass_jit(
            params, self.scene_transforms, camera_pos
        )

    def cached_shadow_prepass(self, params: Optional[FrameParams] = None,
                              camera_pos=None):
        """``shadow_prepass`` memoized on the values it depends on (sun
        direction, max height, scene transforms — plus the quantized eye
        CELL under shadow_select="main"/shadow_eye_quant): recomputes
        only when one changes, otherwise returns the stored device
        arrays. Cell invalidation is EXACT: the light pass consumes only
        the snapped eye, which is constant within a cell. The per-frame
        analog of a real engine's static-scene shadow-map cache; drive
        loops call this every frame."""
        import numpy as np

        cfg = self.config
        if params is None:
            params = FrameParams.default(self.light)
        cell = None
        if (cfg.shadow_select == "main" and cfg.shadow_eye_quant > 0.0
                and camera_pos is not None):
            cell = tuple(
                np.floor(
                    np.asarray(camera_pos, np.float32)
                    / np.float32(cfg.shadow_eye_quant)
                ).astype(np.int64).tolist()
            )
        key = (
            np.asarray(params.light_direction).tobytes(),
            np.asarray(params.max_height).tobytes(),
            None if self.scene_transforms is None
            else np.asarray(self.scene_transforms).tobytes(),
            cell,
        )
        cached = getattr(self, "_shadow_prepass_cache", None)
        if cached is None or cached[0] != key:
            self._shadow_prepass_cache = (
                key, self.shadow_prepass(params, camera_pos)
            )
        return self._shadow_prepass_cache[1]

    def render_shadow_depth(self, params: Optional[FrameParams] = None
                            ) -> jnp.ndarray:
        """Light-view depth map (z01), jit-compiled. Reference:
        Renderer.cpp:333-380 shadow phase."""
        if params is None:
            params = FrameParams.default(self.light)
        if not hasattr(self, "_light_depth_jit"):
            def depth_only(p, xf):
                wa = None
                if self._scene_obj is not None:
                    wa = self._scene_blocks(xf, p.max_height)
                return self._light_depth_pass(p, scene_wa=wa)[0]

            self._light_depth_jit = jax.jit(depth_only)
        return self._light_depth_jit(params, self.scene_transforms)
