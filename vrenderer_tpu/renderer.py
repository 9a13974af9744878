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
    ):
        self.config = config
        if heightmap is None:
            # missing-texture fallback: the reference warns and binds a
            # black texture (Renderer.cpp:58-63, TerrainPass.cpp:415-417)
            import warnings

            warnings.warn("heightmap missing; using black texture")
            heightmap = jnp.zeros((2, 2), jnp.float32)
        if albedo is None:
            albedo = jnp.zeros(heightmap.shape + (3,), jnp.float32)
        self.heightmap = heightmap
        self.albedo = albedo
        self.light = light
        self.raster_backend = raster_backend
        self.interpret = interpret
        self.max_work = max_work
        _, self.tri_indices = gridmod.make_grid(config.terrain.grid_size)
        self._scene_world, self._scene_attrs, self._scene_tri_idx = (
            self._prepare_scene(scene)
        )
        self._frame_jit = jax.jit(self._frame)

    def _prepare_scene(self, scene):
        """Chunk scene meshes into raster blocks (the reference's
        'GBuffer fill' geometry, Renderer.cpp:384-399). Static per
        renderer; scene edits rebuild (the reference re-refreshes buffers
        each frame, Renderer.cpp:328-331 — cheap here too if needed)."""
        if scene is None or not scene.instances:
            return None, None, None
        from vrenderer_tpu.models import mesh as meshmod

        tpb = self.config.terrain.tris_per_instance
        worlds, attrs = [], []
        tri_idx = None
        for inst in scene.instances:
            m = meshmod.transform_mesh(inst.mesh, inst.transform)
            w, a, tri_idx, _ = meshmod.mesh_to_blocks(
                m, tpb, jnp.float32(400.0)
            )
            worlds.append(w)
            attrs.append(a)
        return (
            jnp.concatenate(worlds), jnp.concatenate(attrs), tri_idx,
        )

    # -- passes ------------------------------------------------------------

    def _terrain_pass(self, vc: Dict[str, jnp.ndarray], params: FrameParams,
                      shadow_field: jnp.ndarray, instances=None,
                      mesh_shadow_fn=None):
        """Select -> vertex -> setup -> rasterize. Returns raster products.
        A precomputed instance set freezes selection (lock-view).
        ``mesh_shadow_fn`` maps scene vertex positions (B, V, 3) to shadow
        factors (B, V) — how scene meshes RECEIVE shadows (the reference
        PCF-samples the shadow map for every G-buffer pixel including
        mesh pixels, Renderer.cpp:417-428)."""
        cfg = self.config
        ts = cfg.terrain
        if instances is None:
            planes = math3d.frustum_planes(vc["world_to_clip"])
            instances = quadtree.select_all_surfaces(
                ts, vc["camera_pos"], planes, ts.lod_ranges()
            )
        vout = vertex.vertex_stage(
            ts, instances, vc["camera_pos"], self.heightmap, self.albedo,
            shadow_field, params.max_height, ts.lod_ranges(),
        )
        setup = raster.setup_triangles(
            vout.world, vout.attrs, instances.valid, self.tri_indices,
            vc["world_to_clip"], cfg.width, cfg.height,
        )
        n_scene = 0
        if self._scene_world is not None:
            # scene meshes ("GBuffer fill" geometry) ride the same raster
            # as extra instance blocks
            n_scene = self._scene_world.shape[0]
            s_attrs = self._scene_attrs
            if mesh_shadow_fn is not None:
                shad = mesh_shadow_fn(self._scene_world)
                s_attrs = s_attrs.at[..., vertex.ATTR_SHADOW].set(shad)
            s_setup = raster.setup_triangles(
                self._scene_world, s_attrs,
                jnp.ones((n_scene,), bool), self._scene_tri_idx,
                vc["world_to_clip"], cfg.width, cfg.height,
            )
            setup = raster.TriSetup(
                edge=jnp.concatenate([setup.edge, s_setup.edge]),
                planes=jnp.concatenate([setup.planes, s_setup.planes]),
                bbox=jnp.concatenate([setup.bbox, s_setup.bbox]),
                valid=jnp.concatenate([setup.valid, s_setup.valid]),
            )
        wire_px = 1.0 if cfg.raster.wireframe else 0.0
        if self.raster_backend == "xla":
            z, prim_id, attrs = raster.rasterize_xla(
                setup, cfg.padded_width, cfg.padded_height,
                tile=(cfg.raster.subtile_h, 128),
                batch=cfg.raster.tri_batch,
                reverse_z=cfg.raster.reverse_z,
                wire_px=wire_px,
            )
            z = z[:cfg.height, :cfg.width]
            prim_id = prim_id[:cfg.height, :cfg.width]
            attrs = attrs[:cfg.height, :cfg.width]
        else:
            packed = raster_pallas.pack_tri_data(
                setup, ts.max_instances + n_scene, ts.tris_per_instance,
                tri_batch=cfg.raster.tri_batch,
            )
            bbox, usable, dist = raster_pallas.instance_screen_bbox(
                vout.world, vc["world_to_clip"], cfg.width, cfg.height,
                instances.valid,
            )
            if n_scene:
                s_bbox, s_usable, s_dist = raster_pallas.instance_screen_bbox(
                    self._scene_world, vc["world_to_clip"],
                    cfg.width, cfg.height, jnp.ones((n_scene,), bool),
                )
                bbox = jnp.concatenate([bbox, s_bbox])
                usable = jnp.concatenate([usable, s_usable])
                dist = jnp.concatenate([dist, s_dist])
            work = raster_pallas.build_work_list(
                bbox, usable, cfg.width, cfg.height,
                tile=cfg.raster.tile_w,
                tris_per_inst=ts.tris_per_instance,
                max_work=self.max_work,
                order_key=dist,
                packed=packed,
                sub_h=cfg.raster.subtile_h,
                compact_k=cfg.raster.compact_k,
            )
            z, prim_id, attrs, _ = raster_pallas.rasterize_pallas(
                packed, work, cfg.width, cfg.height,
                tile=cfg.raster.tile_w, sub_h=cfg.raster.subtile_h,
                compact_k=cfg.raster.compact_k,
                reverse_z=cfg.raster.reverse_z,
                max_work=self.max_work,
                interpret=self.interpret,
                wire_px=wire_px,
            )
            return z, prim_id, attrs, instances, work.num_items
        return z, prim_id, attrs, instances, jnp.int32(0)

    def _view_rays(self, vc: Dict[str, jnp.ndarray]):
        """Unit world-space rays through every pixel (for sky + specular)."""
        cfg = self.config
        x = (jnp.arange(cfg.width, dtype=jnp.float32) + 0.5) / cfg.width
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

    def _frame(self, camera: Camera, params: FrameParams) -> FrameOutput:
        return self._frame_impl(camera, params, None)

    def _frame_with_instances(self, camera: Camera, params: FrameParams,
                              instances) -> FrameOutput:
        return self._frame_impl(camera, params, instances)

    def _frame_adaptive(self, camera: Camera, params: FrameParams,
                        adapted_lum: jnp.ndarray, dt: jnp.ndarray):
        """Frame with eye adaptation: returns (FrameOutput, new_adapted_lum).
        Reference: tonemap auto-exposure advanced per frame
        (m_ToneMappingPass->AdvanceFrame(seconds), Renderer.cpp:188-189)."""
        return self._frame_impl(camera, params, None,
                                adapt=(adapted_lum, dt))

    def _frame_impl(self, camera: Camera, params: FrameParams,
                    lock_instances, adapt=None):
        cfg = self.config
        vc = make_view_constants(
            camera, cfg.width, cfg.height, cfg.vfov_degrees,
            cfg.z_near, cfg.z_far,
        )

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
        if cfg.shadow_mode == "map":
            depth_map, wtc_l, z_range, shadow_items = self._light_depth_pass(
                params, vc["camera_pos"]
            )
            shadow_overflow = (shadow_items > self.max_work).astype(
                jnp.int32
            )
            hw = self.heightmap * params.max_height
            Ht, Wt = self.heightmap.shape
            gx = jnp.linspace(-world_size / 2, world_size / 2, Wt)
            gz = jnp.linspace(-world_size / 2, world_size / 2, Ht)
            X, Z = jnp.meshgrid(gx, gz, indexing="xy")
            pts = jnp.stack([X, hw, Z], axis=-1).reshape(-1, 3)
            shadow_field = shadow.shadow_factors_from_map(
                depth_map, wtc_l, z_range, pts
            ).reshape(Ht, Wt)
            if self._scene_world is not None:
                def mesh_shadow_fn(w):
                    return shadow.shadow_factors_from_map(
                        depth_map, wtc_l, z_range, w.reshape(-1, 3)
                    ).reshape(w.shape[:2])
        elif self._scene_world is not None:
            mesh_top = shadow.mesh_top_field(
                self._scene_world,
                jnp.ones((self._scene_world.shape[0],), bool),
                world_size, self.heightmap.shape[0],
            )
            shadow_field, sline = shadow.horizon_shadow_field(
                self.heightmap, params.max_height, world_size,
                params.light_direction, occluder_h=mesh_top,
                with_shadow_line=True,
            )

            def mesh_shadow_fn(w):
                u = texture.world_to_uv(w[..., 0], world_size)
                v = texture.world_to_uv(w[..., 2], world_size)
                s_at = texture.sample_points_matmul(
                    sline, u.reshape(-1), v.reshape(-1)
                ).reshape(w.shape[:2])
                return shadow.shadow_line_factor(w[..., 1], s_at)
        else:
            shadow_field = shadow.horizon_shadow_field(
                self.heightmap, params.max_height, world_size,
                params.light_direction,
            )

        # "Terrain": geometry + visibility + interpolated G-buffer attrs
        z, prim_id, attrs, instances, n_work = self._terrain_pass(
            vc, params, shadow_field, lock_instances,
            mesh_shadow_fn=mesh_shadow_fn,
        )
        covered = (prim_id >= 0) & (params.render_terrain > 0.5)

        albedo = attrs[..., vertex.ATTR_ALBEDO]
        normal = attrs[..., vertex.ATTR_NORMAL]
        shadow_px = jnp.clip(attrs[..., vertex.ATTR_SHADOW], 0.0, 1.0)

        rays = self._view_rays(vc)

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
                hdr, covered, adapted_lum, dt
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
                | (instances.count > cfg.terrain.max_instances)
                | (shadow_overflow > 0)
            ),
        )
        if adapt is not None:
            return out, new_adapted
        return out

    def render(self, camera: Camera, params: Optional[FrameParams] = None
               ) -> FrameOutput:
        if params is None:
            params = FrameParams.default(self.light)
        return self._frame_jit(camera, params)

    def render_adaptive(self, camera: Camera, params: FrameParams,
                        adapted_lum, dt):
        """Render with eye adaptation; thread the returned adapted
        luminance into the next call (seed: lighting.adapt_exposure's
        clamp midpoint, e.g. 0.5). Returns (FrameOutput, adapted_lum)."""
        if not hasattr(self, "_frame_adaptive_jit"):
            self._frame_adaptive_jit = jax.jit(self._frame_adaptive)
        return self._frame_adaptive_jit(
            camera, params, jnp.float32(adapted_lum), jnp.float32(dt)
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
        return self._frame_locked_jit(camera, params, instances)

    def reload_pipelines(self):
        """Shader-hot-reload analog (reference: m_ShaderReoladRequested ->
        ClearCache + rebuild passes, Renderer.cpp:226-231): drops all
        compiled executables so the next frame retraces/recompiles."""
        jax.clear_caches()
        self._frame_jit = jax.jit(self._frame)
        if hasattr(self, "_frame_locked_jit"):
            del self._frame_locked_jit

    # -- shadow-map fill pass (reference "Terrain Shadow" counter) ---------

    def _light_depth_pass(self, params: FrameParams,
                          camera_pos: Optional[jnp.ndarray] = None):
        """Depth-only raster of terrain + scene meshes from the sun's
        ortho view on the Pallas kernel — the reference's shadow phase
        (TerrainPass depth-only, Renderer.cpp:354-367, plus the scene
        DepthPass, :371-379). Jittable; used by shadow_mode="map" and
        render_shadow_depth. Returns (depth (R, R) z01, world->clip,
        z_range meters).

        LOD selection runs from the MAIN camera position when given, so
        shadow geometry matches view geometry (avoids LOD-mismatch acne);
        the light frustum still culls. The reference selects from the
        shadow view's own (distant) eye, which collapses everything to
        the coarsest LOD — strictly worse, so this deviation is kept.
        """
        cfg = self.config
        ts = cfg.terrain
        res = cfg.shadow_resolution
        world_size = float(ts.world_size)
        wtc = shadow.light_view_matrices(
            params.light_direction, world_size, params.max_height, res,
        )
        z_range = world_size * 3.0 - 0.1
        planes = math3d.frustum_planes(wtc)
        if camera_pos is None:
            camera_pos = jnp.array([0.0, 1.0, 0.0], jnp.float32) \
                * params.max_height
        instances = quadtree.select_all_surfaces(
            ts, camera_pos, planes, ts.lod_ranges()
        )
        shadow_field = jnp.ones_like(self.heightmap)
        vout = vertex.vertex_stage(
            ts, instances, camera_pos, self.heightmap, self.albedo,
            shadow_field, params.max_height, ts.lod_ranges(),
        )
        setup = raster.setup_triangles(
            vout.world, vout.attrs, instances.valid, self.tri_indices,
            wtc, res, res,
        )
        world_pts = vout.world
        n_scene = 0
        if self._scene_world is not None:
            n_scene = self._scene_world.shape[0]
            s_setup = raster.setup_triangles(
                self._scene_world, self._scene_attrs,
                jnp.ones((n_scene,), bool), self._scene_tri_idx,
                wtc, res, res,
            )
            setup = raster.TriSetup(
                edge=jnp.concatenate([setup.edge, s_setup.edge]),
                planes=jnp.concatenate([setup.planes, s_setup.planes]),
                bbox=jnp.concatenate([setup.bbox, s_setup.bbox]),
                valid=jnp.concatenate([setup.valid, s_setup.valid]),
            )
        if self.raster_backend == "xla":
            z, _, _ = raster.rasterize_xla(setup, res, res)
            return z, wtc, z_range, jnp.int32(0)
        packed = raster_pallas.pack_tri_data(
            setup, ts.max_instances + n_scene, ts.tris_per_instance,
            tri_batch=cfg.raster.tri_batch,
        )
        bbox, usable, dist = raster_pallas.instance_screen_bbox(
            world_pts, wtc, res, res, instances.valid,
        )
        if n_scene:
            s_bbox, s_usable, s_dist = raster_pallas.instance_screen_bbox(
                self._scene_world, wtc, res, res,
                jnp.ones((n_scene,), bool),
            )
            bbox = jnp.concatenate([bbox, s_bbox])
            usable = jnp.concatenate([usable, s_usable])
            dist = jnp.concatenate([dist, s_dist])
        work = raster_pallas.build_work_list(
            bbox, usable, res, res, tile=cfg.raster.tile_w,
            tris_per_inst=ts.tris_per_instance, max_work=self.max_work,
            order_key=dist, packed=packed, sub_h=cfg.raster.subtile_h,
            compact_k=cfg.raster.compact_k,
        )
        z, _, _, _ = raster_pallas.rasterize_pallas(
            packed, work, res, res, tile=cfg.raster.tile_w,
            sub_h=cfg.raster.subtile_h, compact_k=cfg.raster.compact_k,
            max_work=self.max_work, interpret=self.interpret,
        )
        return z, wtc, z_range, work.num_items

    def render_shadow_depth(self, params: Optional[FrameParams] = None
                            ) -> jnp.ndarray:
        """Light-view depth map (z01), jit-compiled. Reference:
        Renderer.cpp:333-380 shadow phase."""
        if params is None:
            params = FrameParams.default(self.light)
        if not hasattr(self, "_light_depth_jit"):
            self._light_depth_jit = jax.jit(
                lambda p: self._light_depth_pass(p)[0]
            )
        return self._light_depth_jit(params)
