"""Render flythrough frames on the current backend and dump PNGs + stats.

Usage: python scripts/capture.py [outdir] [num_frames] [width] [height]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from vrenderer_tpu.config import FrameConfig, TerrainSettings
from vrenderer_tpu.app import App


def _cube_scene(heightmap, max_height=400.0, world_size=2048.0):
    """A ring of large cubes resting on the terrain near the flythrough
    look-at region — exercises the scene path + shadow interplay
    (cast + receive) end to end."""
    import jax.numpy as jnp
    from vrenderer_tpu.models import mesh as meshmod
    from vrenderer_tpu.models import scene as scenemod
    from vrenderer_tpu.ops import texture
    from vrenderer_tpu.utils import math3d

    insts = []
    for i in range(6):
        ang = i / 6.0 * 2.0 * np.pi
        x, z = 150.0 * np.cos(ang), 150.0 * np.sin(ang)
        ground = float(texture.sample_points(
            heightmap,
            jnp.float32((x + world_size / 2) / world_size),
            jnp.float32((z + world_size / 2) / world_size),
        )) * max_height
        size = 25.0 + 10.0 * (i % 3)
        insts.append(scenemod.MeshInstance(
            mesh=meshmod.cube(size, color=(0.8, 0.15 + 0.1 * i, 0.1)),
            transform=math3d.affine_translation(jnp.asarray(
                [x, ground + size / 2, z], jnp.float32)),
        ))
    return scenemod.Scene(instances=insts)


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vrt_frames"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 1920
    h = int(sys.argv[4]) if len(sys.argv) > 4 else 1152
    with_scene = "--scene" in sys.argv
    os.makedirs(outdir, exist_ok=True)

    on_tpu = jax.default_backend() == "tpu"
    cfg = FrameConfig(
        width=w, height=h,
        terrain=TerrainSettings(max_instances=1024),
    )
    scene = None
    if with_scene:
        from vrenderer_tpu.terrain import heightmap as hmod
        hm = hmod.procedural_heightmap(256, 1234)
        scene = _cube_scene(hm)
    app = App(cfg, raster_backend="pallas" if on_tpu else "xla",
              scene=scene)
    outs = app.run_flythrough(
        num_frames=n, dump_dir=outdir,
        trace_path=os.path.join(outdir, "trace.json"),
    )
    for i, o in enumerate(outs):
        cov = float(np.mean(np.asarray(o.prim_id) >= 0))
        ldr = np.asarray(o.ldr)
        print(
            f"frame {i}: coverage={cov:.3f} instances={int(o.num_instances)}"
            f" mean={ldr.mean():.3f} [{ldr.min():.3f},{ldr.max():.3f}]"
        )
    print(f"avg frame (host wall, incl. transfers): "
          f"{app.profiler.average_frame_ms():.1f} ms")
    print(f"wrote {n} frames to {outdir}")


if __name__ == "__main__":
    main()
