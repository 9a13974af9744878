"""Quality probe: map-mode light-raster resolution (2048^2 default vs
1024^2) on hardware — per-frame ldr MAE/max over the flythrough, the
error bound for bench --mode map --shadowres 1024 (VERDICT r4 next #4,
the judge's half-resolution-light-raster candidate).

Usage (TPU): python scripts/probe_shadowres.py [res=1024] [frames=8]
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vrenderer_tpu.config import FrameConfig, TerrainSettings
from vrenderer_tpu.renderer import Renderer, FrameParams
from vrenderer_tpu.terrain import heightmap as hmod
from vrenderer_tpu.camera import flythrough, Camera

WIDTH, HEIGHT = 1920, 1152


def build(res):
    cfg = FrameConfig(
        width=WIDTH, height=HEIGHT,
        terrain=TerrainSettings(max_instances=1024),
        shadow_mode="map", shadow_resolution=res, shadow_select="main",
    )
    hm = hmod.procedural_heightmap(256)
    alb = hmod.procedural_albedo(hm)
    return Renderer(cfg, hm, alb, raster_backend="pallas",
                    interpret=False, max_work=2048, max_active=768)


def main():
    res = 1024
    nf = 8
    for a in sys.argv[1:]:
        if a.startswith("res="):
            res = int(a[4:])
        elif a.startswith("frames="):
            nf = int(a[7:])
    cams = flythrough(64, heightmap=hmod.procedural_heightmap(256),
                      max_height=400.0)
    idxs = list(range(0, 64, 64 // nf))
    params = FrameParams.default()

    def frames(r):
        out = []
        for i in idxs:
            cam = Camera(eye=cams.eye[i], target=cams.target[i],
                         up=cams.up[i])
            out.append(np.asarray(r.render(cam, params).ldr))
        return out

    base = frames(build(2048))
    test = frames(build(res))
    maes = [np.abs(a - b).mean() for a, b in zip(test, base)]
    mx = max(np.abs(a - b).max() for a, b in zip(test, base))
    print(f"shadowres {res} vs 2048: ldr MAE mean {np.mean(maes):.5f} "
          f"worst-frame {max(maes):.5f} max |d| {mx:.3f}  "
          f"per-frame {[round(float(m), 5) for m in maes]}")


if __name__ == "__main__":
    main()
