"""Raster-kernel experiment bench: variant timings + work-list statistics.

Builds the real 1080p bench scene once, then times kernel variants via
chained on-device iteration (axon RTT cancels out). Also dumps the
(item, subtile) triangle-incidence statistics that size the compaction
design. Throwaway measurement tooling — not part of the library.

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site \
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/kexp.py \
  [variants...]
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vrenderer_tpu.ops import raster_pallas as rp
from vrenderer_tpu.ops.raster import F32_FAR

WIDTH, HEIGHT = 1920, 1152


def build_inputs(cam_idx=0):
    from vrenderer_tpu.config import FrameConfig, TerrainSettings
    from vrenderer_tpu.renderer import Renderer, FrameParams
    from vrenderer_tpu.terrain import heightmap as hmod, quadtree
    from vrenderer_tpu.camera import flythrough, Camera, make_view_constants
    from vrenderer_tpu.ops import shadow, vertex, raster
    from vrenderer_tpu.utils import math3d

    cfg = FrameConfig(width=WIDTH, height=HEIGHT,
                      terrain=TerrainSettings(max_instances=1024))
    hm = hmod.procedural_heightmap(256)
    alb = hmod.procedural_albedo(hm)
    r = Renderer(cfg, hm, alb, raster_backend="pallas", interpret=False,
                 max_work=2048)
    params = FrameParams.default()
    cams = flythrough(64, heightmap=hm, max_height=400.0)
    cam = Camera(eye=cams.eye[cam_idx], target=cams.target[cam_idx],
                 up=cams.up[cam_idx])

    ts = cfg.terrain
    vc = make_view_constants(cam, cfg.width, cfg.height, cfg.vfov_degrees,
                             cfg.z_near, cfg.z_far)
    shadow_field = shadow.horizon_shadow_field(
        hm, params.max_height, float(ts.world_size), params.light_direction)
    planes = math3d.frustum_planes(vc["world_to_clip"])
    instances = quadtree.select_all_surfaces(
        ts, vc["camera_pos"], planes, ts.lod_ranges())
    vout = vertex.vertex_stage(ts, instances, vc["camera_pos"], hm, alb,
                               shadow_field, params.max_height,
                               ts.lod_ranges())
    setup = raster.setup_triangles(
        vout.world, vout.attrs, instances.valid, r.tri_indices,
        vc["world_to_clip"], cfg.width, cfg.height)
    packed = rp.pack_tri_data(setup, ts.max_instances, ts.tris_per_instance,
                              tri_batch=cfg.raster.tri_batch)
    bbox, usable, dist = rp.instance_screen_bbox(
        vout.world, vc["world_to_clip"], cfg.width, cfg.height,
        instances.valid)
    work = rp.build_work_list(
        bbox, usable, cfg.width, cfg.height, tile=cfg.raster.tile_w,
        tris_per_inst=ts.tris_per_instance, max_work=r.max_work,
        order_key=dist, batch_meta=packed.batch_meta,
        sub_h=cfg.raster.subtile_h,
        tri_xspan=rp.tri_xspans(setup, ts.max_instances,
                                ts.tris_per_instance))
    return cfg, packed, work


def work_stats(cfg, packed, work):
    """Numpy statistics of the work list: eval counts for the current
    chunked-dense kernel AND for a hypothetical per-(item,subtile)
    compacted kernel."""
    meta = np.asarray(work.meta)
    sr = np.asarray(work.sub_range)
    td = np.asarray(packed.tri_data)       # (I, T, 48)
    n_items = int(np.asarray(work.num_items))
    B = cfg.raster.tri_batch
    W_E = min(64, B)
    sub_h = cfg.raster.subtile_h
    tile = cfg.raster.tile_w
    n_sub = tile // sub_h

    valid_items = meta[5] == 1
    print(f"work items: {n_items} (max {meta.shape[1]}), "
          f"valid {valid_items.sum()}")

    # current kernel eval counts
    hits = sr >= 0                          # (n_batch, W)
    t_lo = (sr >> 10) & 255
    t_hi = (sr >> 18) & 255
    s_lo = sr & 31
    s_hi = (sr >> 5) & 31
    n_chunks = np.where(hits, (t_hi - t_lo + W_E) // W_E, 0)
    n_subs = np.where(hits, s_hi - s_lo + 1, 0)
    evals = (n_chunks * n_subs).sum()
    print(f"(batch,tile) visits: {hits.sum()}, chunk evals: "
          f"{n_chunks.sum()}, sub evals: {evals} of (W_E={W_E}, P={sub_h*tile})")

    # hypothetical compaction: per (item, subtile) incidence from tri bboxes
    bb = td[:, :, rp._R_BBOX:rp._R_BBOX + 4]   # (I, T, 4)
    vv = td[:, :, rp._R_VALID] > 0
    tiles_x = -(-cfg.width // tile)
    inc_tot = 0
    group_tot = {16: 0, 32: 0, 64: 0, 128: 0}
    pairs = 0
    inc_list = []
    for w in np.nonzero(valid_items)[0]:
        inst = meta[1, w]
        ty, tx = meta[6, w], meta[7, w]
        x0, y0 = tx * tile, ty * tile
        b = bb[inst]
        v = vv[inst]
        xhit = (b[:, 0] <= x0 + tile - 1) & (b[:, 2] >= x0) & v
        for s in range(n_sub):
            sy0, sy1 = y0 + s * sub_h, y0 + (s + 1) * sub_h - 1
            m = xhit & (b[:, 1] <= sy1) & (b[:, 3] >= sy0)
            c = int(m.sum())
            if c:
                pairs += 1
                inc_tot += c
                inc_list.append(c)
                for K in group_tot:
                    group_tot[K] += -(-c // K)
    inc = np.array(inc_list)
    print(f"active (item,subtile) pairs: {pairs}, incidences: {inc_tot}, "
          f"mean {inc.mean():.1f}, p50 {np.percentile(inc, 50):.0f}, "
          f"p90 {np.percentile(inc, 90):.0f}, max {inc.max()}")
    for K, g in group_tot.items():
        print(f"  compacted groups @K={K}: {g} evals of ({K},{sub_h*tile})")


# ---------------------------------------------------------------------------
# variant kernels (copies of the production kernel with switches)
# ---------------------------------------------------------------------------

def make_variant(variant, tile, sub_h, tri_batch, T, reverse_z=False):
    """Returns a kernel fn f(meta, srange, tri) matching rasterize_pallas's
    pallas_call contract."""
    P = sub_h * tile
    n_sub = tile // sub_h
    worst = -rp._FAR if reverse_z else rp._FAR
    B = tri_batch
    W_E = min(64, B)

    def kernel(meta_ref, srange_ref, tri_ref, z_ref, id_ref, attr_ref,
               z_scr, id_scr, coef_acc, rhs_rel):
        w = pl.program_id(0)
        first = meta_ref[2, w]
        last = meta_ref[3, w]
        base_id = meta_ref[4, w]
        ty = meta_ref[6, w]
        tx = meta_ref[7, w]
        b_lo = meta_ref[8, w]
        b_hi = meta_ref[9, w]
        x0f = tx.astype(jnp.float32) * tile
        y0f = ty.astype(jnp.float32) * tile

        @pl.when(w == 0)
        def _init_consts():
            rows = jax.lax.broadcasted_iota(jnp.int32, (48, 4 * P), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (48, 4 * P), 1)
            q = cols // P
            p = cols % P
            dx = (p % tile).astype(jnp.float32) + 0.5
            dy = (p // tile).astype(jnp.float32) + 0.5
            r = rows - 3 * q
            rhs_rel[:] = jnp.where(
                (rows < 12) & (r == 0), dx,
                jnp.where((rows < 12) & (r == 1), dy, jnp.float32(0.0)),
            )

        @pl.when(first == 1)
        def _init_tile():
            z_scr[:] = jnp.full((n_sub, P), worst, jnp.float32)
            id_scr[:] = jnp.full((n_sub, P), rp._BIG_ID, jnp.int32)
            coef_acc[:] = jnp.zeros_like(coef_acc)

        tri_iota = jax.lax.broadcasted_iota(jnp.int32, (W_E, P), 0)
        item_valid_f = meta_ref[5, w]
        zmin_q = meta_ref[10, w]
        z_edge = jnp.max(z_scr[:])
        edge_q = jnp.ceil(jnp.clip(z_edge, 0.0, 2.0) * (1 << 20)
                          ).astype(jnp.int32)
        run_item = (item_valid_f == 1) & (zmin_q <= edge_q)

        def batch_body(b, _):
            packed_range = srange_ref[b, w]

            @pl.when(packed_range >= 0)
            def _hit():
                s_lo = packed_range & 31
                s_hi = (packed_range >> 5) & 31
                t_lo = (packed_range >> 10) & 255
                t_hi = (packed_range >> 18) & 255
                n_chunks = (t_hi - t_lo + W_E) // W_E

                def chunk_body(k, _):
                    t0 = jnp.minimum(b * B + t_lo + k * W_E,
                                     b * B + B - W_E)
                    blk = tri_ref[0, pl.ds(t0, W_E), :]
                    if variant == "erel2pass":
                        blk_hi = blk.astype(jnp.bfloat16).astype(jnp.float32)
                        blk_lo = blk - blk_hi
                        erel = jax.lax.dot_general(
                            blk_hi, rhs_rel[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ) + jax.lax.dot_general(
                            blk_lo, rhs_rel[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    else:
                        erel = jax.lax.dot_general(
                            blk, rhs_rel[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )
                    live = blk[:, rp._R_VALID:rp._R_VALID + 1] > 0.0
                    coefs = blk[:, rp._R_COEF:rp._R_COEF + rp.NUM_COEF]

                    def sub_body(sidx, _):
                        if variant == "emptysub":
                            z_scr[pl.ds(sidx, 1), :] = jnp.minimum(
                                z_scr[pl.ds(sidx, 1), :],
                                erel[0:1, 3 * P:4 * P])
                            return 0
                        sy0 = y0f + sidx.astype(jnp.float32) * sub_h

                        def off(base):
                            return (blk[:, base:base + 1] * x0f
                                    + blk[:, base + 1:base + 2] * sy0
                                    + blk[:, base + 2:base + 3])

                        e0 = erel[:, 0 * P:1 * P] + off(rp._R_EDGE + 0)
                        e1 = erel[:, 1 * P:2 * P] + off(rp._R_EDGE + 3)
                        e2 = erel[:, 2 * P:3 * P] + off(rp._R_EDGE + 6)
                        zq = erel[:, 3 * P:4 * P] + off(rp._R_Z)
                        m = jnp.minimum(e0, jnp.minimum(e1, e2))
                        cover = (m >= 0.0) & live
                        zv = jnp.where(cover, zq, worst)
                        z_best = jnp.min(zv, axis=0, keepdims=True)
                        idx = jnp.min(jnp.where(zv == z_best, tri_iota, W_E),
                                      axis=0, keepdims=True)
                        covered = idx < W_E
                        gid = jnp.where(covered, base_id + t0 + idx,
                                        rp._BIG_ID)
                        zs = z_scr[pl.ds(sidx, 1), :]
                        ids = id_scr[pl.ds(sidx, 1), :]
                        better = z_best < zs
                        upd = covered & (better | ((z_best == zs)
                                                   & (gid < ids)))
                        if variant != "nocoef":
                            onehot = (tri_iota == idx).astype(jnp.float32)
                            coef_hi = coefs.astype(jnp.bfloat16
                                                   ).astype(jnp.float32)
                            coef_lo = coefs - coef_hi
                            dims = (((0,), (0,)), ((), ()))
                            new_coef = jax.lax.dot_general(
                                coef_hi, onehot, dims,
                                preferred_element_type=jnp.float32,
                            ) + jax.lax.dot_general(
                                coef_lo, onehot, dims,
                                preferred_element_type=jnp.float32,
                            )
                            acc = coef_acc[pl.ds(sidx, 1), 0:rp.NUM_COEF, :]
                            coef_acc[pl.ds(sidx, 1), 0:rp.NUM_COEF, :] = (
                                jnp.where(upd[None], new_coef[None], acc))
                        z_scr[pl.ds(sidx, 1), :] = jnp.where(upd, z_best, zs)
                        id_scr[pl.ds(sidx, 1), :] = jnp.where(upd, gid, ids)
                        return 0

                    if variant == "nosub":
                        z_scr[pl.ds(0, 1), :] = jnp.minimum(
                            z_scr[pl.ds(0, 1), :], erel[0:1, 3 * P:4 * P])
                    else:
                        jax.lax.fori_loop(s_lo, s_hi + 1, sub_body, 0)
                    return 0

                if variant == "nochunk":
                    z_scr[pl.ds(0, 1), :] = jnp.full(
                        (1, P), jnp.float32(packed_range), jnp.float32)
                else:
                    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
            return 0

        @pl.when(run_item)
        def _run_batches():
            jax.lax.fori_loop(b_lo, b_hi + 1, batch_body, 0)

        @pl.when(last == 1)
        def _finalize():
            z_ref[:] = z_scr[:].reshape(tile, tile)
            idf = pltpu.bitcast(id_scr[:], jnp.float32)
            id_ref[:] = pltpu.bitcast(idf.reshape(tile, tile), jnp.int32)
            attr_ref[:] = jnp.zeros_like(attr_ref)

    return kernel


def run_variant(variant, cfg, packed, work, max_work=2048):
    tile = cfg.raster.tile_w
    sub_h = cfg.raster.subtile_h
    tri_batch = cfg.raster.tri_batch
    tri_data = packed.tri_data
    I, T, C = tri_data.shape
    n_batch = T // tri_batch
    pad_w = -(-cfg.width // tile) * tile
    pad_h = -(-cfg.height // tile) * tile
    n_sub = tile // sub_h
    P = sub_h * tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(max_work,),
        in_specs=[pl.BlockSpec((1, T, rp._R_TOTAL),
                               lambda w, meta, sr: (meta[1, w], 0, 0))],
        out_specs=[
            pl.BlockSpec((tile, tile),
                         lambda w, meta, sr: (meta[6, w], meta[7, w])),
            pl.BlockSpec((tile, tile),
                         lambda w, meta, sr: (meta[6, w], meta[7, w])),
            pl.BlockSpec((16, tile, tile),
                         lambda w, meta, sr: (0, meta[6, w], meta[7, w])),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_sub, P), jnp.float32),
            pltpu.VMEM((n_sub, P), jnp.int32),
            pltpu.VMEM((n_sub, 32, P), jnp.float32),
            pltpu.VMEM((48, 4 * P), jnp.float32),
        ],
    )
    kernel = make_variant(variant, tile, sub_h, tri_batch, T)

    def call(td):
        z, idb, attr = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32),
                jax.ShapeDtypeStruct((pad_h, pad_w), jnp.int32),
                jax.ShapeDtypeStruct((16, pad_h, pad_w), jnp.float32),
            ])(work.meta, work.sub_range, td)
        return z

    def chain(n):
        def body(i, carry):
            td, acc = carry
            z = call(td)
            s = z.mean() * 1e-30
            return (td + s, acc + z[0, 0])
        return jax.jit(lambda td: jax.lax.fori_loop(
            0, n, body, (td, jnp.float32(0.0)))[1])

    f4, f12 = chain(4), chain(12)
    float(f4(tri_data)); float(f12(tri_data))  # compile
    t4 = min(_t(lambda: float(f4(tri_data))) for _ in range(3))
    t12 = min(_t(lambda: float(f12(tri_data))) for _ in range(3))
    ms = (t12 - t4) / 8 * 1000
    print(f"variant {variant:12s}: {ms:8.2f} ms/frame")
    return ms


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    args = sys.argv[1:] or ["stats"]
    cam_idx = 0
    variants = []
    for a in args:
        if a.startswith("cam="):
            cam_idx = int(a[4:])
        else:
            variants.append(a)
    cfg, packed, work = build_inputs(cam_idx)
    print(f"camera {cam_idx}")
    for v in variants:
        if v == "stats":
            work_stats(cfg, packed, work)
        else:
            run_variant(v, cfg, packed, work)
