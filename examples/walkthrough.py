"""Interactive-style walkthrough: drive the first-person controller
across the terrain (the reference's FirstPersonCamera + Animate loop,
Renderer.cpp:149-185) and render frames along the way.

Scripted input events stand in for GLFW callbacks: walk forward, look
around, sprint — each tick integrates velocity exactly like the editor's
`step` command. Writes PNGs + prints the window-title FPS line.

Usage: python examples/walkthrough.py [outdir] [n_frames]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vrenderer_tpu.app import App, write_png
from vrenderer_tpu.camera import FirstPersonController
from vrenderer_tpu.config import FrameConfig, TerrainSettings


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vrt_walk"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    os.makedirs(outdir, exist_ok=True)

    import jax

    on_tpu = jax.default_backend() == "tpu"
    cfg = FrameConfig() if on_tpu else FrameConfig(
        width=256, height=128,
        terrain=TerrainSettings(surface_size=64, world_size=64,
                                max_instances=64, grid_size=8),
    )
    app = App(cfg, raster_backend="pallas" if on_tpu else "xla")
    if not on_tpu:
        import jax.numpy as jnp

        app.params = app.params._replace(max_height=jnp.float32(12.0))

    import jax.numpy as jnp

    from vrenderer_tpu.camera import Camera

    ws = float(cfg.terrain.world_size)
    start = Camera(
        eye=jnp.asarray([0.0, 0.0, ws * 0.25], jnp.float32),
        target=jnp.asarray([0.0, 0.0, 0.0], jnp.float32),
        up=jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
    )
    fpc = FirstPersonController(
        camera=start,
        heightmap=app.heightmap,
        world_size=ws,
        max_height=float(np.asarray(app.params.max_height)),
        walk=True, move_speed=max(4.0, ws * 0.02),
    )
    fpc.key_event("w", True)                  # hold forward
    dt = 1.0 / 30.0
    for i in range(n):
        if i == n // 2:
            fpc.key_event("shift", True)      # sprint the second half
        fpc.mouse_move(6.0, -1.0)             # gentle look drift
        cam = fpc.animate(dt)
        app.profiler.begin_frame()
        with app.profiler.scope("Render"):
            out = app.renderer.render(cam, app.params)
            ldr = np.asarray(out.ldr)
        app.profiler.end_frame()
        write_png(f"{outdir}/walk_{i:04d}.png", ldr)
        e = np.asarray(cam.eye)
        print(f"frame {i}: eye ({e[0]:7.1f}, {e[1]:6.1f}, {e[2]:7.1f}) "
              f"speed {np.linalg.norm(fpc.vel):5.1f} m/s "
              f"coverage {float((np.asarray(out.prim_id) >= 0).mean()):.2f}")
    print(app.window_title())


if __name__ == "__main__":
    main()
