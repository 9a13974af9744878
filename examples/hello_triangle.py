"""Hello triangle — the framework's shaders/shaders.hlsl analog (the
Donut sample leftover in the reference, shaders.hlsl:23-52): one colored
triangle through the real rasterizer, written to a PNG.

Usage: python examples/hello_triangle.py [out.png]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from vrenderer_tpu.app import write_png
from vrenderer_tpu.ops import raster


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hello_triangle.png"
    W, H = 512, 256
    # ndc triangle with per-vertex colors in the attribute channels
    tri = np.asarray(
        [[-0.7, -0.7, 0.5], [0.0, 0.8, 0.5], [0.7, -0.7, 0.5]], np.float32
    )
    colors = np.asarray(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32
    )
    world = np.zeros((1, 2, 2, 3), np.float32)
    attrs = np.zeros((1, 2, 2, 8), np.float32)
    for order in ([0, 1, 2], [0, 2, 1]):
        world.reshape(4, 3)[:3] = tri[order]
        attrs.reshape(4, 8)[:3, 0:3] = colors[order]
        setup = raster.setup_triangles(
            jnp.asarray(world), jnp.asarray(attrs), jnp.ones((1,), bool),
            jnp.asarray([[0, 1, 2]], jnp.int32), jnp.eye(4, dtype=jnp.float32),
            W, H,
        )
        if bool(setup.valid[0]):
            break
    z, prim, at = raster.rasterize_xla(setup, W, H, tile=(8, 128), batch=8)
    img = np.array(at[..., 0:3])  # copy: jax array views are read-only
    img[np.asarray(prim) < 0] = 0.08
    write_png(out, img)
    print(f"wrote {out}; covered {(np.asarray(prim) >= 0).mean():.1%}")


if __name__ == "__main__":
    main()
