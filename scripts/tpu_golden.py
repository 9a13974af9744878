"""Real-TPU golden frame: capture and check.

The CPU golden (tests/test_golden.py) runs the oracle in exact f32 and
cannot catch hardware-only regressions (bf16 MXU precision, Mosaic
lowering changes — the round-1 NaN class was found by eyeballing frames).
This pins an actual TPU-rendered 1080p frame:

  python scripts/tpu_golden.py write   # render + store the golden
  python scripts/tpu_golden.py check   # render + compare (rc != 0 on fail)

Stored as tests/golden_tpu.npz: ldr u8 (the real output format after
sRGB), prim_id coverage, and depth stats. Tolerances allow small
cross-version numeric drift but fail loudly on NaNs, artifact speckle,
or coverage shifts.

A second golden pins the reference shadow architecture on hardware
(shadow_mode="map" at 2048^2, Renderer.cpp:83-93; stored as
tests/golden_tpu_map.npz):

  python scripts/tpu_golden.py write-map / check-map
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", "tests", "golden_tpu.npz")
GOLDEN_MAP = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "..", "tests", "golden_tpu_map.npz")


def render(shadow_mode="horizon"):
    from vrenderer_tpu.app import App
    from vrenderer_tpu.config import FrameConfig, TerrainSettings
    from vrenderer_tpu.camera import flythrough, Camera

    app = App(FrameConfig(width=1920, height=1152,
                          terrain=TerrainSettings(max_instances=1024),
                          shadow_mode=shadow_mode,
                          shadow_resolution=2048))
    cams = flythrough(64, heightmap=app.renderer.heightmap,
                      max_height=400.0)
    cam = Camera(eye=cams.eye[7], target=cams.target[7], up=cams.up[7])
    out = app.renderer.render(cam, app.params)
    ldr = np.asarray(out.ldr)
    prim = np.asarray(out.prim_id)
    depth = np.asarray(out.depth)
    return ldr, prim, depth


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    is_map = mode.endswith("-map")
    golden_path = GOLDEN_MAP if is_map else GOLDEN
    mode = mode.replace("-map", "")
    ldr, prim, depth = render("map" if is_map else "horizon")
    assert np.all(np.isfinite(ldr)), "NaN/inf in TPU ldr output"
    u8 = np.clip(np.round(ldr * 255.0), 0, 255).astype(np.uint8)
    cov = prim >= 0
    if mode == "write":
        np.savez_compressed(
            golden_path, ldr_u8=u8, covered=cov,
            depth_mean=np.float32(depth[cov].mean()),
        )
        print(f"wrote {golden_path}: coverage {cov.mean():.4f}")
        return 0
    g = np.load(golden_path)
    dd = np.abs(u8.astype(np.int16) - g["ldr_u8"].astype(np.int16))
    cov_diff = (cov != g["covered"]).mean()
    bad = (dd > 8).mean()
    print(f"coverage {cov.mean():.4f} (golden {g['covered'].mean():.4f}, "
          f"diff frac {cov_diff:.5f})")
    print(f"ldr u8: mean abs diff {dd.mean():.3f}, frac>8 {bad:.5f}, "
          f"max {dd.max()}")
    ok = cov_diff < 0.002 and bad < 0.001 and dd.mean() < 0.5
    print("TPU GOLDEN:", "OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
