"""Quality probe: quantized-eye shadow selection (shadow_eye_quant) vs
the exact per-frame view-matched default, on hardware at the map bench
config. Reports per-frame and mean ldr MAE/max plus shadow-field MAE —
the acceptance evidence for bench --mode mapsnap (target: ldr MAE vs the
default < 0.01, VERDICT r4 next #4).

Usage (TPU): JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
    python scripts/probe_snap.py [quants=64,128,256] [frames=8]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

from vrenderer_tpu.config import FrameConfig, TerrainSettings
from vrenderer_tpu.renderer import Renderer, FrameParams
from vrenderer_tpu.terrain import heightmap as hmod
from vrenderer_tpu.camera import flythrough, Camera

WIDTH, HEIGHT = 1920, 1152


def build(quant):
    cfg = FrameConfig(
        width=WIDTH, height=HEIGHT,
        terrain=TerrainSettings(max_instances=1024),
        shadow_mode="map", shadow_resolution=2048,
        shadow_select="main", shadow_eye_quant=quant,
    )
    hm = hmod.procedural_heightmap(256)
    alb = hmod.procedural_albedo(hm)
    return Renderer(cfg, hm, alb, raster_backend="pallas",
                    interpret=False, max_work=2048, max_active=768)


def frames_ldr(r, cams, idxs, params):
    out = []
    for i in idxs:
        cam = Camera(eye=cams.eye[i], target=cams.target[i],
                     up=cams.up[i])
        o = r.render(cam, params)
        out.append(np.asarray(o.ldr))
    return out


def main():
    quants = [64.0, 128.0, 256.0]
    nf = 8
    for a in sys.argv[1:]:
        if a.startswith("quants="):
            quants = [float(v) for v in a[7:].split(",")]
        elif a.startswith("frames="):
            nf = int(a[7:])
    cams = flythrough(64, heightmap=hmod.procedural_heightmap(256),
                      max_height=400.0)
    idxs = list(range(0, 64, 64 // nf))
    params = FrameParams.default()

    base = frames_ldr(build(0.0), cams, idxs, params)
    for q in quants:
        r = build(q)
        ldrs = frames_ldr(r, cams, idxs, params)
        maes = [np.abs(a - b).mean() for a, b in zip(ldrs, base)]
        mx = max(np.abs(a - b).max() for a, b in zip(ldrs, base))
        print(f"quant={q:6.0f}: ldr MAE mean {np.mean(maes):.5f} "
              f"worst-frame {max(maes):.5f} max |d| {mx:.3f}  "
              f"per-frame {[round(m, 5) for m in maes]}")


if __name__ == "__main__":
    main()
