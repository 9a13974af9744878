"""Benchmark: 1080p terrain flythrough FPS on one TPU chip.

Matches BASELINE.md config 2 (full quadtree LOD + frustum culling,
scripted camera flythrough, 1080p) against the driver's north-star target
of >= 120 FPS (BASELINE.json; the reference publishes no numbers of its
own). Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

Measurement notes: the axon tunnel to the chip has ~150 ms host RTT and
its async dispatch does not block on completion, so wall-timing a single
dispatch is meaningless. Frames are chained on-device (each frame's
camera perturbed by a data dependency on nothing host-side) inside ONE
jitted scan; the per-frame time is (t_long - t_short) / (n_long -
n_short) across two chain lengths, which cancels RTT and fixed overheads.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 120.0  # north-star target (BASELINE.json / BASELINE.md)

# default: 1080p padded to whole 128px supertile rows (BASELINE config 2).
# --mode 4k: BASELINE config 5 (prints per-pass counters to stderr).
# --mode map: 1080p with shadow_mode="map" at 2048^2 (the reference's
#   actual shadow architecture, Renderer.cpp:83-93) — one extra Pallas
#   depth raster + filtered comparison sampling per frame. Shadow
#   geometry is selected from the MAIN eye (view-matched LOD).
# --mode mapref: map mode with shadow_select="light" — the reference's
#   actual shadow-pass LOD semantics (TerrainPass.cpp:183 selects from
#   the CSM proxy view's distant origin, collapsing the shadow mesh to
#   the coarsest rings; see docs/PERFORMANCE.md for the quality cost).
# --mode mapsnap: map mode (view-matched shadow LOD) with the
#   QUANTIZED-EYE shadow cache (FrameConfig.shadow_eye_quant): the light
#   pass's selection eye snaps to a world lattice, making the
#   view-matched shadow map piecewise-constant in camera position. The
#   timing chain re-rasters the light view exactly on the flythrough's
#   real cell crossings (lax.cond carries the cached map between them),
#   so the number charges misses at their true rate — the steady-state
#   cost an App loop pays via cached_shadow_prepass.
# --mode mapwalk: mapsnap at WALKING speed — the same quantized-eye
#   cache (default --quant 64, the 0.0101-MAE setting) driven by a
#   ground-level ~2 world-unit/frame camera path instead of the
#   flythrough's ~48 u/frame sprint: the cache crosses a cell every
#   ~30 frames, so the measured number is the steady state any real
#   navigation pays (the flythrough's miss rate is the outlier, not
#   the architecture).
# --mode mapcache: mapref + the static-scene shadow-map cache
#   (FrameConfig.shadow_cache): under shadow_select="light" the
#   whole-world sheared shadow map is camera-independent, so it rasters
#   once per (sun, scene) version instead of once per frame — the
#   steady-state cost every App loop actually pays. The prepass runs
#   inside each timing chain (before the frame loop), so the chain
#   difference charges the frames exactly the cached-loop cost.
# --mode envelope: the reference workload envelope (TerrainPass.h:25
#   MAX_INSTANCES=4096): 4-surface 4096m world at 4K from overhead
#   cameras at the PEAK reachable selection. Note: CDLOD selection is
#   ring-bounded (~150 nodes/level x frustum fraction); probing seam /
#   ground / overhead poses tops out ~650 selected instances, so 4096 is
#   capacity headroom in the reference too (its TerrainPass.cpp:238
#   assert never fires). The envelope asserts selection exceeds the
#   default 512 render budget — the pose class that NEEDS the capacity.
# --mode ground: walking-height camera — exercises the crossing-instance
#   full-frame-bbox path (instances straddling w=0) under load.
MODE = "1080p"
if "--mode" in sys.argv:
    MODE = sys.argv[sys.argv.index("--mode") + 1]
# mapsnap quant cell size (world units); override: --quant N.
# mapwalk defaults to the quality-first 64 (ldr MAE 0.0101) — at
# walking speed the hit rate no longer needs coarse cells.
SNAP_QUANT = 256.0
if MODE == "mapwalk":
    SNAP_QUANT = 64.0
if "--quant" in sys.argv:
    SNAP_QUANT = float(sys.argv[sys.argv.index("--quant") + 1])
# map-mode light-raster resolution; override: --shadowres N (the
# measured 1024 error bound vs the 2048 default lives in
# docs/PERFORMANCE.md round 5)
SHADOW_RES = 2048
if "--shadowres" in sys.argv:
    SHADOW_RES = int(sys.argv[sys.argv.index("--shadowres") + 1])
if MODE in ("4k", "envelope"):
    WIDTH, HEIGHT = 3840, 2176
else:
    WIDTH, HEIGHT = 1920, 1152


def build():
    from vrenderer_tpu.config import FrameConfig, TerrainSettings
    from vrenderer_tpu.renderer import Renderer, FrameParams
    from vrenderer_tpu.terrain import heightmap as hmod
    from vrenderer_tpu.camera import flythrough, Camera

    if MODE == "envelope":
        ts = TerrainSettings(max_instances=4096, surface_size=2048,
                             world_size=4096)
    else:
        ts = TerrainSettings(max_instances=1024)
    cfg = FrameConfig(
        width=WIDTH, height=HEIGHT, terrain=ts,
        shadow_mode="map" if MODE in ("map", "mapref", "mapcache",
                                      "mapsnap", "mapwalk")
        else "horizon",
        shadow_resolution=SHADOW_RES,
        shadow_select="light" if MODE in ("mapref", "mapcache")
        else "main",
        shadow_eye_quant=SNAP_QUANT if MODE in ("mapsnap", "mapwalk")
        else 0.0,
    )
    hm = hmod.procedural_heightmap(256)
    alb = hmod.procedural_albedo(hm)
    on_tpu = jax.default_backend() == "tpu"
    # boot scene: the reference never renders an empty world — main.cpp
    # :89-95 loads Cube.gltf at startup and Scene Refresh / GBuffer fill
    # run every frame (Renderer.cpp:328-331, 384-399). The headline
    # numbers carry the same workload (Scene.default() is the
    # Cube.gltf analog).
    from vrenderer_tpu.models.scene import Scene

    scene = Scene.default()
    # 4K has ~4x the supertiles: 1080p fits ~900 work items in 2048,
    # 4K needs ~2700 (the overflow probe asserts otherwise)
    # render budget: the flythrough selects ~300 instances peak; 512 is
    # the capacity headroom (overflow asserts below catch violations).
    # Pipeline cost scales with the budget, not the selection capacity —
    # the analog of the reference drawing numNodes instances out of its
    # 4096-slot buffer (TerrainPass.cpp:215-222).
    # map mode: the LIGHT pass culls against the sheared sun frustum,
    # which spans the whole world — its selection runs 544-592 over the
    # flythrough (CPU-probed), above the 512 budget that fits the main
    # camera; the frame surfaces that as overflow, so the budget rises
    max_active = {"envelope": 1024, "map": 768, "mapref": 768,
                  "mapcache": 768, "mapsnap": 768,
                  "mapwalk": 768}.get(MODE, 512)
    max_work = 4096 if HEIGHT > 1200 else 2048
    if MODE == "envelope":
        max_work = 6144
    if MODE == "mapwalk":
        # ground-height eye: the near rings select at the finest LODs
        # and the whole-world light raster bins them across all of its
        # supertiles — measured 4252 work items vs the 2048 that fits
        # the airborne flythrough
        max_work = 6144
    r = Renderer(cfg, hm, alb, raster_backend="pallas",
                 interpret=not on_tpu,
                 max_work=max_work,
                 max_active=max_active,
                 scene=scene)
    params = FrameParams.default()
    cams = flythrough(64, heightmap=hm, max_height=400.0,
                      world_size=ts.world_size)
    if MODE == "envelope":
        # overhead orbit at the selection peak: high camera over the
        # 4-surface seam engages every LOD ring of all four quadtrees
        # (~620-650 selected — the reachable maximum, see module note)
        import numpy as np

        ang = 2.0 * np.pi * np.arange(64, dtype=np.float32) / 64.0
        # eye fixed over the seam, gaze orbiting: ~611-613 selected on
        # every frame (CPU-probed; the reachable peak is ~626)
        eye = jnp.tile(jnp.asarray([[0.0, 800.0, 0.0]], jnp.float32),
                       (64, 1))
        tgt = jnp.stack([
            60.0 * jnp.cos(ang), jnp.zeros((64,)),
            60.0 * jnp.sin(ang),
        ], axis=-1)
        cams = Camera(
            eye=eye, target=tgt,
            up=jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32),
                        (64, 1)),
        )
    if MODE == "mapwalk":
        # walking-speed path (~2 u/frame) at eye height over the
        # terrain — the navigation regime the quantized-eye cache is
        # built for (2-3 cell crossings per 64 frames at quant=64)
        import numpy as np

        hm_np = np.asarray(hm)
        res = hm_np.shape[0]
        ws = float(ts.world_size)
        pts = []
        for i in range(64):
            x = -60.0 + 2.0 * i
            z = 40.0 + 0.35 * i
            u = int(np.clip((x / ws + 0.5) * (res - 1), 0, res - 1))
            v = int(np.clip((z / ws + 0.5) * (res - 1), 0, res - 1))
            y = float(hm_np[v, u]) * 400.0 + 2.0
            pts.append((x, y, z))
        g = np.asarray(pts, np.float32)
        eye = jnp.asarray(g)
        tgt = eye + jnp.asarray([[40.0, -2.0, 25.0]], jnp.float32)
        cams = Camera(
            eye=eye, target=tgt,
            up=jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32),
                        (64, 1)),
        )
    if MODE == "ground":
        # walking-height pass: eye ~2.5 m above the terrain, looking
        # along the ground — near instances straddle the near plane
        import numpy as np

        ground = []
        hm_np = np.asarray(hm)
        res = hm_np.shape[0]
        ws = float(ts.world_size)
        for i in range(64):
            ang = 2.0 * np.pi * i / 64.0
            x = 160.0 * np.cos(ang)
            z = 160.0 * np.sin(ang)
            u = int(np.clip((x / ws + 0.5) * (res - 1), 0, res - 1))
            v = int(np.clip((z / ws + 0.5) * (res - 1), 0, res - 1))
            y = float(hm_np[v, u]) * 400.0 + 2.5
            ground.append((x, y, z, np.cos(ang + 0.6), np.sin(ang + 0.6)))
        g = np.asarray(ground, np.float32)
        eye = jnp.asarray(g[:, :3])
        tgt = eye + jnp.stack(
            [g[:, 3] * 50.0, jnp.zeros(64), g[:, 4] * 50.0], axis=-1
        )
        cams = Camera(
            eye=eye, target=tgt,
            up=jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32),
                        (64, 1)),
        )
    return r, params, cams


def chain_fn(renderer, params, cams, n):
    """n flythrough frames inside one jit; returns a scalar that depends
    on every frame so nothing is elided."""
    from vrenderer_tpu.camera import Camera

    if MODE in ("mapsnap", "mapwalk"):
        # quantized-eye shadow cache: scan over frames carrying the
        # cached light-view map; re-raster it (lax.cond) exactly on the
        # flythrough's real eye-cell crossings, so misses are charged at
        # their true rate. Frame 0's raster runs before the loop (it is
        # the steady-state cache fill, like mapcache's prepass).
        import numpy as np

        q = SNAP_QUANT
        cells = np.floor(np.asarray(cams.eye, np.float32) / np.float32(q))
        new_cell = np.concatenate(
            [[False], (np.abs(np.diff(cells, axis=0)).sum(axis=1) > 0)]
        )
        n_miss = int(new_cell.sum()) + 1
        print(f"mapsnap: quant={q}, {n_miss} light rasters / 64 frames",
              file=sys.stderr)
        new_cell_dev = jnp.asarray(new_cell)

        def run():
            def light(eye):
                wa = None
                if renderer._scene_obj is not None:
                    wa = renderer._scene_blocks(
                        renderer.scene_transforms, params.max_height
                    )
                out = renderer._light_depth_pass(params, eye, scene_wa=wa)
                return jax.tree_util.tree_map(jnp.asarray, out)

            def body(carry, i):
                idx = i % 64
                eye = cams.eye[idx]
                prepass = jax.lax.cond(
                    new_cell_dev[idx], light, lambda e, c=None: carry, eye
                )
                cam = Camera(eye=eye, target=cams.target[idx],
                             up=cams.up[idx])
                out = renderer._frame_impl(cam, params, None,
                                           shadow_prepass=prepass)
                return prepass, out.ldr.mean() + out.depth.mean()

            carry0 = light(cams.eye[0])
            _, accs = jax.lax.scan(
                body, carry0, jnp.arange(n, dtype=jnp.int32)
            )
            return accs.sum()

        return jax.jit(run)

    def run():
        # mapcache: raster the camera-independent shadow map ONCE per
        # chain (the steady-state cache hit every frame of a real loop);
        # the short/long chain difference charges frames only the
        # cached-loop cost, exactly like App.run_flythrough's loop
        if MODE == "mapcache":
            wa = None
            if renderer._scene_obj is not None:
                wa = renderer._scene_blocks(
                    renderer.scene_transforms, params.max_height
                )
            prepass = renderer._light_depth_pass(params, scene_wa=wa)
        elif (renderer.config.shadow_mode == "horizon"
              and renderer._scene_obj is not None):
            # horizon modes with the boot scene: the mesh-occluder
            # shadow field + shadow line are camera-independent and
            # EXACT to cache (no quantization) — computed once per
            # chain, matching App.run_flythrough's
            # cached_horizon_prepass steady state (bit-identical
            # frames, tests/test_shadow_cache.py)
            prepass = renderer._horizon_fields(
                params, renderer.scene_transforms
            )
        else:
            prepass = None

        def body(i, acc):
            cam = Camera(
                eye=cams.eye[i % 64], target=cams.target[i % 64],
                up=cams.up[i % 64],
            )
            out = renderer._frame_impl(cam, params, None,
                                       shadow_prepass=prepass)
            # Whole-image reductions: XLA must not slice-sink/prune the
            # full-screen lighting/tonemap/sky work behind a few pixels.
            return acc + out.ldr.mean() + out.depth.mean()

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    return jax.jit(run)


def timed(f):
    t0 = time.perf_counter()
    v = float(f())
    return time.perf_counter() - t0, v


def main():
    renderer, params, cams = build()
    # overflow honesty: a too-small max_work/max_instances renders holes;
    # fail the bench loudly rather than publish numbers on a broken frame
    from vrenderer_tpu.camera import Camera

    probe = renderer.render(
        Camera(eye=cams.eye[0], target=cams.target[0], up=cams.up[0]), params
    )
    assert not bool(probe.overflow), (
        f"work-list/instance overflow at bench config "
        f"(work={int(probe.num_work_items)}/{renderer.max_work}, "
        f"instances={int(probe.num_instances)}/{renderer.max_active})"
    )
    if MODE == "envelope":
        # the envelope's point: selection beyond the default 512 render
        # budget, on the 4096-capacity config (>1024 is unreachable
        # under the reference's ring-bounded CDLOD rule — see mode note)
        n_inst = int(probe.num_instances)
        print(f"envelope probe: {n_inst} instances, "
              f"{int(probe.num_work_items)} work items", file=sys.stderr)
        assert n_inst > 512, f"envelope only selected {n_inst} instances"
    short_n, long_n = 4, 20
    f_short = chain_fn(renderer, params, cams, short_n)
    f_long = chain_fn(renderer, params, cams, long_n)
    timed(f_short)  # compile
    timed(f_long)   # compile
    ts = min(timed(f_short)[0] for _ in range(3))
    tl = min(timed(f_long)[0] for _ in range(3))
    per_frame = max((tl - ts) / (long_n - short_n), 1e-6)
    fps = 1.0 / per_frame
    is_4k = MODE == "4k"
    if is_4k:
        # BASELINE config 5: per-pass counters alongside the headline
        try:
            from vrenderer_tpu.app import App
            from vrenderer_tpu.config import FrameConfig, TerrainSettings

            app = App(
                FrameConfig(width=WIDTH, height=HEIGHT,
                            terrain=TerrainSettings(max_instances=1024)),
                raster_backend=renderer.raster_backend,
            )
            app.renderer = renderer
            timer = app.profile_passes()
            print(timer.table(), file=sys.stderr)
        except Exception as e:  # pragma: no cover
            print(f"per-pass profiling failed: {e}", file=sys.stderr)
    metric = {
        "4k": "terrain_flythrough_4k_fps",
        "map": "terrain_flythrough_1080p_shadowmap_fps",
        "mapref": "terrain_flythrough_1080p_shadowmap_reflod_fps",
        "mapcache": "terrain_flythrough_1080p_shadowmap_cached_fps",
        "mapsnap": "terrain_flythrough_1080p_shadowmap_snapcached_fps",
        "mapwalk": "terrain_walkspeed_1080p_shadowmap_snapcached_fps",
        "envelope": "terrain_envelope_4k_4096inst_fps",
        "ground": "terrain_ground_camera_1080p_fps",
    }.get(MODE, "terrain_flythrough_1080p_fps")
    print(json.dumps({
        "metric": metric,
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


def _transient_backend_failure(e: BaseException) -> bool:
    s = str(e)
    return (
        "UNAVAILABLE" in s
        or "Unable to initialize backend" in s
        or "DEADLINE_EXCEEDED" in s
        or "failed to connect" in s.lower()
        or "socket closed" in s.lower()
    )


if __name__ == "__main__":
    # The axon tunnel drops transiently (round 3's driver bench died rc=1
    # on "Unable to initialize backend 'axon'"). A failed backend init is
    # cached inside the process, so retry by RE-EXEC with exponential
    # backoff — a transient outage degrades to a late number, not rc=1.
    _attempt = int(os.environ.get("VRT_BENCH_ATTEMPT", "0"))
    _MAX_ATTEMPTS = 6
    try:
        main()
    except Exception as e:  # noqa: BLE001 — classify, then re-raise
        if _attempt + 1 < _MAX_ATTEMPTS and _transient_backend_failure(e):
            delay = min(60 * 2 ** _attempt, 600)
            print(
                f"bench: transient backend failure (attempt "
                f"{_attempt + 1}/{_MAX_ATTEMPTS}): {e}\nretrying in "
                f"{delay}s",
                file=sys.stderr, flush=True,
            )
            time.sleep(delay)
            os.environ["VRT_BENCH_ATTEMPT"] = str(_attempt + 1)
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise
