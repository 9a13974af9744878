"""Hardware-vs-interpret diff for the compaction kernel.

Runs the same scene through rasterize_pallas on the real TPU and through
the CPU-exact oracle path (the z/id/attr arrays saved from a CPU
interpret run), then reports mismatch statistics. Throwaway diagnosis
tooling.

Usage:
  JAX_PLATFORMS=cpu python scripts/hwdiff.py save /tmp/ref.npz [big]
  python scripts/hwdiff.py run /tmp/ref.npz [big]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(big=False):
    import jax
    import jax.numpy as jnp
    from vrenderer_tpu.config import TerrainSettings
    from vrenderer_tpu.camera import Camera, make_view_constants
    from vrenderer_tpu.ops import raster, raster_pallas, vertex
    from vrenderer_tpu.terrain import grid as gridmod
    from vrenderer_tpu.terrain import quadtree
    from vrenderer_tpu.utils import math3d

    rng = np.random.default_rng(0)
    if big:
        SET = TerrainSettings(surface_size=2048, world_size=2048,
                              max_instances=1024, grid_size=32)
        W, H = 1920, 1152
        max_work = 2048
        K = 32
        if big == "fly":
            # the capture/bench scene, flythrough camera 0
            from vrenderer_tpu.terrain import heightmap as hmod
            from vrenderer_tpu.camera import flythrough

            hm = hmod.procedural_heightmap(256)
            alb = hmod.procedural_albedo(hm)
            shad = jnp.ones_like(hm)
            cams = flythrough(64, heightmap=hm, max_height=400.0)
            cam = Camera(eye=cams.eye[0], target=cams.target[0],
                         up=cams.up[0])
        else:
            eye, target = [0.0, 340.0, 210.0], [-270.0, 230.0, -220.0]
            cam = None
        side = 256
    else:
        SET = TerrainSettings(surface_size=64, world_size=64,
                              max_instances=64, grid_size=8)
        W, H = 256, 128
        eye, target = [25.0, 8.0, 25.0], [-10.0, 2.0, -10.0]
        max_work = 256
        K = 16
        side = 64

    if big != "fly":
        hm = jnp.asarray(
            (0.5 + 0.45 * np.sin(np.linspace(0, 6, side))[None, :]
             * np.cos(np.linspace(0, 5, side))[:, None]).astype(np.float32)
        )
        alb = jnp.asarray(rng.random((side, side, 3)).astype(np.float32))
        shad = jnp.asarray(rng.random((side, side)).astype(np.float32))
        cam = Camera(
            eye=jnp.asarray(eye, jnp.float32),
            target=jnp.asarray(target, jnp.float32),
            up=jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
        )
    vc = make_view_constants(cam, W, H, 60.0, 0.1, 10000.0)
    planes = math3d.frustum_planes(vc["world_to_clip"])
    inst = quadtree.select_all_surfaces(SET, cam.eye, planes,
                                        SET.lod_ranges())
    mh = jnp.float32(12.0 if not big else 400.0)
    vout = vertex.vertex_stage(
        SET, inst, cam.eye, hm, alb, shad, mh, SET.lod_ranges()
    )
    _, tris = gridmod.make_grid(SET.grid_size)
    setup = raster.setup_triangles(
        vout.world, vout.attrs, inst.valid, tris, vc["world_to_clip"], W, H
    )
    T = SET.tris_per_instance
    I = SET.max_instances
    packed = raster_pallas.pack_tri_data(setup, I, T, tri_batch=32)
    bbox, usable, dist = raster_pallas.instance_screen_bbox(
        vout.world, vc["world_to_clip"], W, H, inst.valid
    )
    work = raster_pallas.build_work_list(
        bbox, usable, W, H, tile=128, tris_per_inst=T, max_work=max_work,
        order_key=dist, packed=packed, compact_k=K,
    )
    interp = jax.default_backend() == "cpu"
    z, idb, attrs, _ = raster_pallas.rasterize_pallas(
        packed, work, W, H, tile=128, sub_h=8, compact_k=K,
        max_work=max_work, interpret=interp,
    )
    return (np.asarray(z), np.asarray(idb), np.asarray(attrs))


def main():
    mode, path = sys.argv[1], sys.argv[2]
    big = sys.argv[3] if len(sys.argv) > 3 else False
    if big == "big":
        big = True
    if mode == "save":
        import jax
        jax.config.update("jax_platforms", "cpu")
        z, idb, attrs = build(big)
        np.savez(path, z=z, id=idb, attrs=attrs)
        print("saved", path, "covered px:", (idb >= 0).sum())
        return
    z, idb, attrs = build(big)
    ref = np.load(path)
    rz, rid, rat = ref["z"], ref["id"], ref["attrs"]
    cov_hw = idb >= 0
    cov_ref = rid >= 0
    print("covered hw/ref:", cov_hw.sum(), cov_ref.sum())
    dcov = cov_hw != cov_ref
    print("coverage mismatches:", dcov.sum())
    both = cov_hw & cov_ref
    dif = (idb != rid) & both
    print("id mismatches (both covered):", dif.sum())
    ze = np.abs(np.where(both, z - rz, 0))
    print("z err max:", ze.max())
    ae = np.abs(np.where(both[..., None], attrs - rat, 0))
    print("attr err max:", ae.max())
    if dcov.sum() or dif.sum():
        ys, xs = np.nonzero(dcov | dif)
        print("first mismatches (y, x, hw_id, ref_id):")
        for k in range(min(12, len(ys))):
            y, x = ys[k], xs[k]
            print("  ", y, x, idb[y, x], rid[y, x])
        # which instances are involved
        T = 128 if not big else 2048
        insts = set()
        for y, x in zip(ys[:5000], xs[:5000]):
            for v in (idb[y, x], rid[y, x]):
                if v >= 0:
                    insts.add(int(v) // T)
        print("instances involved:", sorted(insts)[:40])


if __name__ == "__main__":
    main()
