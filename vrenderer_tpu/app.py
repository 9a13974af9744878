"""Headless app shell: the main.cpp equivalent.

The reference's main builds the device, profilers, Renderer and Editor,
then runs the OS message loop (main.cpp:16-107). Headless on TPU, the app
is: build assets + Renderer, iterate a scripted camera, keep the frame
ring, optionally dump PNGs and a chrome trace. Per-pass device timings
(the profiler HUD analog) come from profile_passes(), whose counter names
mirror the reference (SURVEY.md §5.1).
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vrenderer_tpu.config import FrameConfig, LightParams
from vrenderer_tpu.camera import Camera, flythrough, make_view_constants
from vrenderer_tpu.ops import lighting, raster, raster_pallas, shadow, vertex
from vrenderer_tpu.profiler import FrameProfiler, PassTimer
from vrenderer_tpu.renderer import Renderer, FrameParams
from vrenderer_tpu.terrain import heightmap as hmod
from vrenderer_tpu.terrain import quadtree
from vrenderer_tpu.utils import math3d


def write_png(path: str, image01: np.ndarray):
    """Minimal RGB8 PNG writer (no external deps)."""
    img = np.clip(np.asarray(image01), 0.0, 1.0)
    img = (img * 255.0 + 0.5).astype(np.uint8)
    h, w, _ = img.shape
    raw = b"".join(
        b"\x00" + img[y].tobytes() for y in range(h)
    )

    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c)
        )

    header = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", header)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


@dataclass
class App:
    """Build everything (main.cpp analog) and drive frames."""

    config: FrameConfig
    heightmap_resolution: int = 256
    seed: int = 1234
    raster_backend: str = "pallas"
    # startup scene (the reference loads Cube.gltf at boot,
    # main.cpp:89-95); a models.scene.Scene or None
    scene: object = None

    def __post_init__(self):
        on_tpu = jax.default_backend() == "tpu"
        self.heightmap = hmod.procedural_heightmap(
            self.heightmap_resolution, self.seed
        )
        self.albedo = hmod.procedural_albedo(self.heightmap)
        self.renderer = Renderer(
            self.config, self.heightmap, self.albedo,
            raster_backend=self.raster_backend,
            interpret=(self.raster_backend == "pallas" and not on_tpu),
            scene=self.scene,
        )
        self.profiler = FrameProfiler()
        self.params = FrameParams.default()

    def run_flythrough(
        self,
        num_frames: int = 8,
        dump_dir: Optional[str] = None,
        trace_path: Optional[str] = None,
    ):
        cams = flythrough(
            num_frames, world_size=self.config.terrain.world_size,
            heightmap=self.heightmap,
            max_height=float(np.asarray(self.params.max_height)),
        )
        outputs = []
        for i in range(num_frames):
            self.profiler.begin_frame()
            cam = Camera(
                eye=cams.eye[i], target=cams.target[i], up=cams.up[i]
            )
            with self.profiler.scope("Render"):
                out = self.renderer.render(cam, self.params)
                with self.profiler.scope("Wait GPU"):
                    jax.block_until_ready(out.ldr)
            if bool(np.asarray(out.overflow)):
                # the reference asserts on instance overflow
                # (TerrainPass.cpp:238); report loudly instead of
                # rendering holes silently
                import warnings

                warnings.warn(
                    f"frame {i}: raster work list or instance buffer "
                    f"overflowed (work={int(out.num_work_items)}/"
                    f"{self.renderer.max_work}, instances="
                    f"{int(out.num_instances)}); output may be missing "
                    f"geometry — raise max_work/max_instances"
                )
            if dump_dir is not None:
                with self.profiler.scope("Present"):
                    write_png(
                        f"{dump_dir}/frame_{i:04d}.png", np.asarray(out.ldr)
                    )
            self.profiler.end_frame()
            outputs.append(out)
        if trace_path is not None:
            self.profiler.export_chrome_trace(trace_path)
        return outputs

    def window_title(self) -> str:
        """Title-bar string parity: avg ms/frame + FPS
        (SetInformativeWindowTitle, Renderer.cpp:190)."""
        ms = self.profiler.average_frame_ms()
        fps = 1000.0 / ms if ms > 0 else 0.0
        return f"vrenderer_tpu {ms:.1f} ms/frame ({fps:.0f} FPS)"

    def profile_passes(self, camera: Optional[Camera] = None) -> PassTimer:
        """Device-time per-pass breakdown with reference counter names."""
        cfg = self.config
        r = self.renderer
        cam = camera or Camera.default()
        params = self.params
        vc = make_view_constants(
            cam, cfg.width, cfg.height, cfg.vfov_degrees, cfg.z_near,
            cfg.z_far,
        )
        ts = cfg.terrain
        planes = math3d.frustum_planes(vc["world_to_clip"])

        timer = PassTimer()

        # "Terrain Shadow" (horizon-map field)
        timer.measure(
            "Terrain Shadow",
            lambda lx: shadow.horizon_shadow_field(
                r.heightmap, params.max_height, float(ts.world_size), lx
            ),
            params.light_direction,
        )

        shadow_field = shadow.horizon_shadow_field(
            r.heightmap, params.max_height, float(ts.world_size),
            params.light_direction,
        )

        # selection ("TerrainPass::UpdateTransforms" analog)
        timer.measure(
            "TerrainPass::UpdateTransforms",
            lambda eye: quadtree.select_all_surfaces(
                ts, eye, planes, ts.lod_ranges()
            ),
            vc["camera_pos"],
        )
        instances = quadtree.select_all_surfaces(
            ts, vc["camera_pos"], planes, ts.lod_ranges()
        )

        # vertex stage + raster = "Terrain"
        timer.measure(
            "Terrain",
            lambda eye: r._terrain_pass(vc, params, shadow_field)[0],
            vc["camera_pos"],
        )

        vout = vertex.vertex_stage(
            ts, instances, vc["camera_pos"], r.heightmap, r.albedo,
            shadow_field, params.max_height, ts.lod_ranges(),
        )
        setup = raster.setup_triangles(
            vout.world, vout.attrs, instances.valid, r.tri_indices,
            vc["world_to_clip"], cfg.width, cfg.height,
        )
        z, prim_id, attrs, _, _ = r._terrain_pass(vc, params, shadow_field)
        covered = prim_id >= 0
        rays = r._view_rays(vc)

        timer.measure(
            "Deferred Lighting",
            lambda a: lighting.deferred_lighting(
                a[..., vertex.ATTR_ALBEDO], a[..., vertex.ATTR_NORMAL],
                jnp.clip(a[..., vertex.ATTR_SHADOW], 0, 1), covered, -rays,
                params.light_direction, params.light_irradiance,
                params.light_color, params.ambient_intensity,
            ),
            attrs,
        )
        hdr = lighting.deferred_lighting(
            attrs[..., vertex.ATTR_ALBEDO], attrs[..., vertex.ATTR_NORMAL],
            jnp.clip(attrs[..., vertex.ATTR_SHADOW], 0, 1), covered, -rays,
            params.light_direction, params.light_irradiance,
            params.light_color, params.ambient_intensity,
        )
        timer.measure(
            "ToneMapping", lambda h: lighting.tonemap(h, params.exposure), hdr
        )
        timer.measure(
            "Sky", lambda d: lighting.sky_color(d, params.light_direction),
            rays,
        )
        # whole frame = "GPU Frame"
        timer.measure(
            "GPU Frame",
            lambda eye: r._frame(
                Camera(eye=eye, target=cam.target, up=cam.up), params
            ).ldr,
            cam.eye,
        )
        return timer
