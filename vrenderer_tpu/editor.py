"""Headless editor shell — the reference's Editor + RenderUI analog.

The reference's Editor (source/editor/Editor.cpp) is an ImGui window
with: the renderer string + avg ms/frame + FPS readout (Editor.cpp:56-58),
scrolling frame-time plots (:64-91), a profiler-window toggle (:95-102),
a glTF file-open dialog feeding BeginLoadingScene (:104-123), and the
Renderer settings panel (Renderer::RenderUI, Renderer.cpp:456-514:
reload-shaders button, terrain toggles, max-height slider, sun editor,
ambient intensity, instance-count readout, quadtree debug view).

Without a window system, the same surface is a command shell: each
command maps to the corresponding UI control and mutates FrameParams
(traced — no recompiles) or renderer state, then re-renders. Drive it
interactively (`python -m vrenderer_tpu.editor`) or programmatically
(`Editor.execute(...)` — what the tests do).
"""

from __future__ import annotations

import math
import os
import shlex
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from vrenderer_tpu.camera import Camera
from vrenderer_tpu.config import FrameConfig, TerrainSettings


class Editor:
    """Command-driven editor session around an App."""

    def __init__(self, app=None, out_dir: str = "/tmp/vrt_editor"):
        if app is None:
            from vrenderer_tpu.app import App

            app = App(FrameConfig(
                width=512, height=256,
                terrain=TerrainSettings(max_instances=1024),
            ))
        self.app = app
        self.out_dir = out_dir
        self.camera = Camera.default()
        self.fpc = None       # first-person controller ('walk on')
        self.orbit = None     # orbit controller ('orbit on')
        self.locked_instances = None
        self.last_output = None
        self.frame_counter = 0
        # eye adaptation advances across editor renders by default (the
        # reference's per-frame tonemap AdvanceFrame, Renderer.cpp:188-189)
        self.adapt = True
        self.adapted_lum = 0.5
        self._last_render_t: Optional[float] = None
        os.makedirs(out_dir, exist_ok=True)

    # -- command surface ---------------------------------------------------

    def execute(self, line: str) -> str:
        """Run one command; returns the textual response."""
        parts = shlex.split(line)
        if not parts:
            return ""
        cmd, args = parts[0], parts[1:]
        fn = getattr(self, f"cmd_{cmd.replace('-', '_')}", None)
        if fn is None:
            return f"unknown command: {cmd} (try 'help')"
        try:
            return fn(*args) or "ok"
        except Exception as e:  # surface errors like the reference's log
            return f"error: {e}"

    def cmd_help(self):
        return "\n".join([
            "render [out.png]      render a frame (current camera/params)",
            "fly N [dir]           render an N-frame flythrough to dir",
            "camera X Y Z [TX TY TZ]  set eye (and target)",
            "walk on|fly|off       first-person controller (walk pins to "
            "ground; fly moves along the look direction)",
            "step DT [KEYS] [MDX MDY]  one Animate tick: hold KEYS "
            "(wasdeq, uppercase = sprint), mouse-look by (MDX, MDY) px",
            "speed V               first-person move speed (m/s)",
            "orbit on [D]          orbit controller around the current "
            "target at distance D",
            "drag DX DY | zoom F   orbit the view / dolly the distance",
            "light AZ EL           sun direction from azimuth/elevation deg",
            "ambient V | exposure V | max-height V   set render params",
            "terrain on|off        toggle the terrain pass (traced)",
            "adapt on|off          eye adaptation across renders (default on)",
            "debug-quadtree on|off node-id tint overlay",
            "lock | unlock         freeze/unfreeze LOD selection",
            "load PATH             load a glTF/GLB scene",
            "move-instance I X Y Z translate scene instance I (no rebuild)",
            "clear-scene           drop the scene",
            "reload                shader-reload analog (drop jit caches)",
            "stats                 instances/coverage/ms of the last frame",
            "fps                   window-title style avg ms + FPS",
            "flamegraph [out.svg]  export the profiler HUD flame graph",
            "trace [out.json]      export chrome://tracing JSON",
            "shadow-depth [out]    render the light-view depth map",
            "quit                  leave the shell",
        ])

    def _render(self):
        import time

        app = self.app
        app.profiler.begin_frame()
        now = time.perf_counter()
        # Animate(seconds): real elapsed wall time since the previous
        # editor render, clamped so long idle gaps don't snap exposure
        dt = min(
            now - (self._last_render_t or now - 1.0 / 30.0), 0.5
        )
        self._last_render_t = now
        with app.profiler.scope("Render"):
            if self.adapt:
                out, lum = app.renderer.render_adaptive(
                    self.camera, app.params, self.adapted_lum, dt,
                    instances=self.locked_instances,
                )
                self.adapted_lum = float(np.asarray(lum))
            elif self.locked_instances is not None:
                out = app.renderer.render_locked(
                    self.camera, app.params, self.locked_instances
                )
            else:
                out = app.renderer.render(self.camera, app.params)
            np.asarray(out.ldr)  # force execution for honest frame times
        app.profiler.end_frame()
        self.last_output = out
        self.frame_counter += 1
        return out

    def cmd_render(self, out_path: Optional[str] = None):
        from vrenderer_tpu.app import write_png

        out = self._render()
        path = out_path or os.path.join(
            self.out_dir, f"frame_{self.frame_counter:04d}.png"
        )
        write_png(path, np.asarray(out.ldr))
        ov = " OVERFLOW" if bool(out.overflow) else ""
        return (
            f"wrote {path} instances={int(out.num_instances)}"
            f" work={int(out.num_work_items)}{ov}"
        )

    def cmd_fly(self, n: str = "4", dump: Optional[str] = None):
        outs = self.app.run_flythrough(
            num_frames=int(n), dump_dir=dump or self.out_dir
        )
        self.last_output = outs[-1]
        return f"rendered {len(outs)} frames to {dump or self.out_dir}"

    def cmd_camera(self, x, y, z, tx="0", ty="0", tz="0"):
        self.camera = Camera(
            eye=jnp.asarray([float(x), float(y), float(z)], jnp.float32),
            target=jnp.asarray(
                [float(tx), float(ty), float(tz)], jnp.float32
            ),
            up=jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
        )

    def cmd_walk(self, mode="on"):
        """First-person camera (Renderer.cpp:149-181 input surface +
        Animate integration). 'on' = walk (eye pinned to terrain height +
        1.8 m), 'fly' = free-fly, 'off' = back to the static camera."""
        from vrenderer_tpu.camera import FirstPersonController

        if mode == "off":
            self.fpc = None
            return "first-person controller off"
        app = self.app
        self.orbit = None
        self.fpc = FirstPersonController(
            camera=self.camera,
            heightmap=app.heightmap,
            world_size=float(app.config.terrain.world_size),
            max_height=float(np.asarray(app.params.max_height)),
            walk=(mode == "on"),
        )
        self.camera = self.fpc.camera()
        e = np.asarray(self.camera.eye)
        return (
            f"{'walk' if mode == 'on' else 'fly'} mode at "
            f"({e[0]:.1f}, {e[1]:.1f}, {e[2]:.1f})"
        )

    def cmd_step(self, dt, keys="", mdx="0", mdy="0"):
        """One per-frame Animate tick: hold KEYS for this step (wasdeq;
        uppercase sprints), apply a mouse-look delta, integrate
        velocity, update the camera."""
        fpc = getattr(self, "fpc", None)
        if fpc is None:
            return "no first-person controller (run 'walk on' first)"
        held = set()
        for ch in keys:
            if ch in "-.":
                continue
            if ch.isupper():
                held.add("shift")
            held.add(ch.lower())
        fpc._keys = held
        fpc.mouse_move(float(mdx), float(mdy))
        self.camera = fpc.animate(float(dt))
        e = np.asarray(self.camera.eye)
        v = float(np.linalg.norm(fpc.vel))
        return (
            f"eye ({e[0]:.2f}, {e[1]:.2f}, {e[2]:.2f}) "
            f"speed {v:.2f} m/s yaw {math.degrees(fpc.yaw):.1f} "
            f"pitch {math.degrees(fpc.pitch):.1f}"
        )

    def cmd_speed(self, v):
        fpc = getattr(self, "fpc", None)
        if fpc is None:
            return "no first-person controller (run 'walk on' first)"
        fpc.move_speed = float(v)

    def cmd_orbit(self, mode="on", dist=None):
        from vrenderer_tpu.camera import OrbitController

        if mode == "off":
            self.orbit = None
            return "orbit controller off"
        self.fpc = None
        eye = np.asarray(self.camera.eye)
        tgt = np.asarray(self.camera.target)
        d = float(dist) if dist is not None else float(
            np.linalg.norm(eye - tgt)
        )
        off = eye - tgt
        self.orbit = OrbitController(
            pivot=tgt, distance=d,
            yaw=math.atan2(float(off[2]), float(off[0])),
            pitch=math.asin(float(np.clip(off[1] / max(d, 1e-6), -1, 1))),
        )
        self.camera = self.orbit.camera()
        return f"orbiting ({tgt[0]:.1f}, {tgt[1]:.1f}, {tgt[2]:.1f}) at {d:.1f}"

    def cmd_drag(self, dx, dy):
        orb = getattr(self, "orbit", None)
        if orb is None:
            return "no orbit controller (run 'orbit on' first)"
        orb.drag(float(dx), float(dy))
        self.camera = orb.camera()

    def cmd_zoom(self, factor):
        orb = getattr(self, "orbit", None)
        if orb is None:
            return "no orbit controller (run 'orbit on' first)"
        orb.zoom(float(factor))
        self.camera = orb.camera()
        return f"distance {orb.distance:.1f}"

    def cmd_light(self, az, el):
        a, e = math.radians(float(az)), math.radians(float(el))
        d = jnp.asarray(
            [-math.cos(e) * math.cos(a), -math.sin(e),
             -math.cos(e) * math.sin(a)], jnp.float32
        )
        self.app.params = self.app.params._replace(light_direction=d)

    def cmd_ambient(self, v):
        self.app.params = self.app.params._replace(
            ambient_intensity=jnp.float32(float(v))
        )

    def cmd_exposure(self, v):
        self.app.params = self.app.params._replace(
            exposure=jnp.float32(float(v))
        )

    def cmd_max_height(self, v):
        self.app.params = self.app.params._replace(
            max_height=jnp.float32(float(v))
        )

    def cmd_terrain(self, onoff):
        self.app.params = self.app.params._replace(
            render_terrain=jnp.float32(1.0 if onoff == "on" else 0.0)
        )

    def cmd_adapt(self, onoff):
        self.adapt = onoff == "on"
        return f"eye adaptation {'on' if self.adapt else 'off'} " \
               f"(lum={self.adapted_lum:.3f})"

    def cmd_debug_quadtree(self, onoff):
        self.app.params = self.app.params._replace(
            debug_quadtree=jnp.float32(1.0 if onoff == "on" else 0.0)
        )

    def cmd_lock(self):
        self.locked_instances = self.app.renderer.select(self.camera)
        return "LOD selection frozen (lock-view)"

    def cmd_unlock(self):
        self.locked_instances = None
        return "LOD selection live"

    def cmd_load(self, path):
        from vrenderer_tpu.models import scene as scenemod
        from vrenderer_tpu.renderer import Renderer

        sc = scenemod.load_gltf(path)
        app = self.app
        app.renderer = Renderer(
            app.config, app.heightmap, app.albedo,
            raster_backend=app.renderer.raster_backend,
            interpret=app.renderer.interpret, scene=sc,
        )
        return f"loaded {path}: {len(sc.instances)} instance(s)"

    def cmd_move_instance(self, idx, dx, dy, dz):
        """Translate scene instance ``idx`` by (dx, dy, dz) — a traced
        transform update (Scene::RefreshSceneGraph analog): the next
        frame picks it up with no Renderer rebuild and no recompile."""
        r = self.app.renderer
        if r.scene_transforms is None:
            return "no scene loaded"
        i = int(idx)
        t = jnp.asarray([float(dx), float(dy), float(dz)], jnp.float32)
        r.scene_transforms = r.scene_transforms.at[i, 3].add(t)
        p = np.asarray(r.scene_transforms[i, 3])
        return f"instance {i} origin now ({p[0]:g}, {p[1]:g}, {p[2]:g})"

    def cmd_clear_scene(self):
        from vrenderer_tpu.renderer import Renderer

        app = self.app
        app.renderer = Renderer(
            app.config, app.heightmap, app.albedo,
            raster_backend=app.renderer.raster_backend,
            interpret=app.renderer.interpret,
        )

    def cmd_reload(self):
        self.app.renderer.reload_pipelines()
        return "pipelines dropped; next frame recompiles"

    def cmd_stats(self):
        out = self.last_output
        if out is None:
            return "no frame rendered yet"
        cov = float(np.mean(np.asarray(out.prim_id) >= 0))
        return (
            f"instances={int(out.num_instances)} "
            f"work_items={int(out.num_work_items)} "
            f"coverage={cov:.3f} overflow={bool(out.overflow)}"
        )

    def cmd_fps(self):
        ms = self.app.profiler.average_frame_ms()
        fps = 1000.0 / ms if ms > 0 else 0.0
        # window-title parity (SetInformativeWindowTitle, Renderer.cpp:190)
        return f"vrenderer_tpu - {ms:.2f} ms/frame ({fps:.1f} FPS)"

    def cmd_flamegraph(self, out_path: Optional[str] = None):
        path = out_path or os.path.join(self.out_dir, "flame.svg")
        self.app.profiler.export_flamegraph_svg(path)
        return f"wrote {path}"

    def cmd_trace(self, out_path: Optional[str] = None):
        path = out_path or os.path.join(self.out_dir, "trace.json")
        self.app.profiler.export_chrome_trace(path)
        return f"wrote {path}"

    def cmd_shadow_depth(self, out_path: Optional[str] = None):
        from vrenderer_tpu.app import write_png

        z = np.asarray(self.app.renderer.render_shadow_depth(
            self.app.params))
        z01 = np.clip(np.where(z > 1e30, 1.0, z), 0.0, 1.0)
        img = np.repeat(z01[..., None], 3, axis=-1)
        path = out_path or os.path.join(self.out_dir, "shadow_depth.png")
        write_png(path, img)
        return f"wrote {path}"

    def repl(self):  # pragma: no cover - interactive only
        print("vrenderer_tpu editor — 'help' for commands")
        while True:
            try:
                line = input("vrt> ")
            except EOFError:
                break
            if line.strip() in ("quit", "exit"):
                break
            resp = self.execute(line)
            if resp:
                print(resp)


if __name__ == "__main__":  # pragma: no cover
    Editor().repl()
