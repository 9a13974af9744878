"""TPU fast-path rasterizer: a fused Pallas kernel.

Replaces the reference's hardware rasterization + depth test behind
drawIndexed (TerrainPass.cpp:215-222) with a single Pallas kernel shaped
entirely by measured v5e costs (scatter ~0.15G el/s, gather ~0.15G el/s,
sort 2.8ms/1.5M — all banned from the frame path; MXU matmuls at
198 TFLOP/s are nearly free).

Structure:

* Screen is divided into 128x128-pixel supertiles. Instances are binned
  to supertiles by screen bbox ([instances x supertiles] dense overlap +
  cumsum compaction) into a flat, supertile-major work list ordered
  near-to-far within each tile (so early-z can reject occluded batches).
* One grid step per work item. Scalar-prefetched metadata drives the
  input index_maps (block-sparse DMA of one instance's triangle data);
  consecutive steps share a supertile so its z/id/coefficient state stays
  VMEM-resident.
* Edge/depth evaluation rides the MXU: each 128-triangle batch's 12
  affine coefficients (3 edges + z plane) are multiplied once per batch
  against a constant block-diagonal SUBTILE-RELATIVE pixel matrix
  (48 x 4*1024), yielding all edge/z values for every pixel position of
  an 8x128 subtile at once; per subtile only a (128, 4) origin-offset
  matmul and broadcast-adds remain. The VPU does just the
  coverage/min/merge chain (~8 passes over (128, 1024)).
* Attributes resolve in the same pass: a one-hot [27 x 128-tri] @
  [128 x 1024-px] MXU matmul swaps the depth winner's interpolation
  PLANE COEFFICIENTS into the per-pixel accumulator (exactly-one-hot via
  masked-iota-min; ties break to the lowest triangle id).
* Per-batch screen bboxes and conservative z-ranges are precomputed
  host-side (pack_tri_data) and scalar-compared in-kernel: batches skip
  subtiles they do not touch, and early-z rejects batches strictly behind
  a fully-covered subtile.

Depth convention matches ops/raster.py (the reference's LessOrEqual /
GreaterOrEqual PipelineKey bits, TerrainPass.cpp:478-482). Semantics are
oracle-tested against ops/raster.rasterize_xla.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vrenderer_tpu.ops.raster import TriSetup, F32_FAR

# packed tri-data rows (last axis of the [I, T, 48] block)
_R_EDGE = 0          # 9: three edges x (a, b, c)
_R_Z = 9             # 3: z plane
_R_COEF = 12         # 27: [inv_w, attr0..7] planes, SoA (a[9], b[9], c[9])
_R_VALID = 39        # 1
_R_BBOX = 40         # 4: x0, y0, x1, y1 (pixels)
_R_TOTAL = 48

# batch-meta rows (per 128-triangle batch): bbox + z range
_BM_COLS = 8         # x0, y0, x1, y1, zmin, zmax, pad, pad

NUM_COEF = 27        # inv_w + 8 attrs, 3 coefficients each
_FAR = 3.0e38
_BIG_ID = 2**31 - 1


class PackedTris(NamedTuple):
    tri_data: jnp.ndarray     # (I, T, 48) f32
    batch_meta: jnp.ndarray   # (I, n_batch, 8) f32


def pack_tri_data(
    setup: TriSetup, num_instances: int, tris_per_inst: int,
    tri_batch: int = 128,
) -> PackedTris:
    """TriSetup (flat I*T) -> block-sparse kernel layout + batch metadata.

    Invalid triangles (w <= eps, degenerate, culled) can carry inf/NaN
    coefficients; they are zeroed so the kernel's one-hot coefficient
    matmul (which contracts the whole batch) never sees NaN.
    """
    n = num_instances * tris_per_inst
    ok = setup.valid[:, None]
    edge = jnp.where(ok, setup.edge.reshape(n, 9), 0.0)
    planes3 = jnp.where(ok[:, :, None], setup.planes, 0.0)  # (n, 10, 3)
    z = planes3[:, 0, :]
    # coefficient rows structure-of-arrays: strided sublane slices lower
    # to unsupported gathers in Mosaic
    coef = jnp.swapaxes(planes3[:, 1:10, :], 1, 2).reshape(n, 27)
    valid = setup.valid.astype(jnp.float32)[:, None]
    bbox = jnp.where(ok, setup.bbox, 0.0)
    pad = jnp.zeros((n, _R_TOTAL - 44), jnp.float32)
    packed = jnp.concatenate([edge, z, coef, valid, bbox, pad], axis=1)
    tri_data = packed.reshape(num_instances, tris_per_inst, _R_TOTAL)

    # per-batch conservative screen bbox + z range (for in-kernel skips)
    nb = tris_per_inst // tri_batch
    vb = setup.valid.reshape(num_instances, nb, tri_batch)
    bb = setup.bbox.reshape(num_instances, nb, tri_batch, 4)
    big = jnp.where(ok, setup.bbox, jnp.asarray(
        [_FAR, _FAR, -_FAR, -_FAR], jnp.float32)
    ).reshape(num_instances, nb, tri_batch, 4)
    bx0 = jnp.min(big[..., 0], axis=-1)
    by0 = jnp.min(big[..., 1], axis=-1)
    bx1 = jnp.max(big[..., 2], axis=-1)
    by1 = jnp.max(big[..., 3], axis=-1)
    del bb
    # conservative batch z-range from the z plane evaluated at bbox
    # corners of each tri (z is affine, extrema at corners)
    zp = jnp.where(ok, setup.planes[:, 0, :], 0.0).reshape(
        num_instances, nb, tri_batch, 3
    )
    tb = setup.bbox.reshape(num_instances, nb, tri_batch, 4)
    zs = []
    for xi, yi in ((0, 1), (0, 3), (2, 1), (2, 3)):
        zs.append(zp[..., 0] * tb[..., xi] + zp[..., 1] * tb[..., yi]
                  + zp[..., 2])
    zc = jnp.stack(zs, axis=-1)  # (I, nb, B, 4)
    zmin_t = jnp.where(vb, jnp.min(zc, -1), _FAR)
    zmax_t = jnp.where(vb, jnp.max(zc, -1), -_FAR)
    bzmin = jnp.min(zmin_t, axis=-1)
    bzmax = jnp.max(zmax_t, axis=-1)
    zero = jnp.zeros_like(bx0)
    batch_meta = jnp.stack(
        [bx0, by0, bx1, by1, bzmin, bzmax, zero, zero], axis=-1
    )
    return PackedTris(tri_data=tri_data, batch_meta=batch_meta)


def tri_xspans(setup: TriSetup, num_instances: int, tris_per_inst: int):
    """(I, T, 2) per-triangle x extents for build_work_list's range
    refinement; invalid triangles get an empty span."""
    ok = setup.valid[:, None]
    span = jnp.where(
        ok,
        setup.bbox[:, (0, 2)],
        jnp.asarray([_FAR, -_FAR], jnp.float32),
    )
    return span.reshape(num_instances, tris_per_inst, 2)


class WorkList(NamedTuple):
    """Flat supertile-major work items.

    meta rows: st, inst, first, last, base_id, item_valid, tile_y, tile_x,
    b_lo, b_hi (inclusive batch range hitting the tile), item zmin
    (f32 bits, for exact early-z skips).
    sub_range[k, w]: per-(item, batch-k) packed subtile range
    (s_lo * 64 + s_hi, inclusive; s_lo > s_hi encodes "skip"), so the
    kernel reads only cheap SMEM scalars in its hot loops."""

    meta: jnp.ndarray       # (11, MAX_WORK) int32
    sub_range: jnp.ndarray  # (n_batch, MAX_WORK) int32
    num_items: jnp.ndarray  # () int32 (> MAX_WORK means overflow/drop)


def instance_screen_bbox(
    world: jnp.ndarray, world_to_clip: jnp.ndarray, width: int, height: int,
    inst_valid: jnp.ndarray, w_eps: float = 1e-4,
):
    """Conservative per-instance pixel bbox: in-front vertex hull, widened
    to the full frame when the instance straddles the near plane (its
    clipless crossing triangles can reach any pixel). Instances fully
    behind are dropped (parent-emitted quadtree nodes are not
    frustum-tested — QuadTree.cpp:122-126 — and often sit behind the
    camera). Returns (bbox (I, 4), usable (I,), mean_dist (I,))."""
    from vrenderer_tpu.utils import math3d

    I = world.shape[0]
    verts = world.reshape(I, -1, 3)
    clip = math3d.transform_points_h(world_to_clip, verts)
    xy, _, _ = math3d.clip_to_screen(clip, width, height)
    front = clip[..., 3] > w_eps
    big = 1e9
    x0 = jnp.min(jnp.where(front, xy[..., 0], big), axis=1)
    y0 = jnp.min(jnp.where(front, xy[..., 1], big), axis=1)
    x1 = jnp.max(jnp.where(front, xy[..., 0], -big), axis=1)
    y1 = jnp.max(jnp.where(front, xy[..., 1], -big), axis=1)
    any_front = jnp.any(front, axis=1)
    # an instance with verts on both sides of the near plane may own
    # clipless crossing triangles whose visible region extends beyond the
    # in-front-vertex hull — conservative full-frame bbox (rare: only the
    # instance(s) under the camera)
    crossing = any_front & jnp.any(~front, axis=1)
    x0 = jnp.where(crossing, 0.0, x0)
    y0 = jnp.where(crossing, 0.0, y0)
    x1 = jnp.where(crossing, width - 1.0, x1)
    y1 = jnp.where(crossing, height - 1.0, y1)
    on = (x1 >= 0) & (y1 >= 0) & (x0 < width) & (y0 < height)
    # camera distance proxy (clip w ~ view depth) for near-to-far ordering
    dist = jnp.where(front, clip[..., 3], big).min(axis=1)
    return (
        jnp.stack([x0, y0, x1, y1], axis=-1),
        inst_valid & on & any_front,
        dist,
    )


def build_work_list(
    bbox: jnp.ndarray,        # (I, 4) pixel bbox
    usable: jnp.ndarray,      # (I,)
    width: int, height: int,
    tile: int = 128,
    tris_per_inst: int = 2048,
    max_work: int = 2048,
    order_key: jnp.ndarray | None = None,  # (I,) ascending processing order
    batch_meta: jnp.ndarray = None,  # (I, n_batch, 8) from pack — required
    sub_h: int = 8,
    tri_xspan: jnp.ndarray | None = None,  # (I, T, 2) per-tri x0/x1 pixels
) -> WorkList:
    """Supertile-major (st, instance) pairs, one leading dummy per
    supertile. With order_key (camera distance), instances are emitted
    near-to-far within each tile so early-z culls occluded batches.

    sub_range packs, per (item, batch): subtile range s_lo/s_hi (5 bits
    each) and — when tri_xspan is given — the index range [t_lo, t_hi]
    of triangles whose x extent touches the tile (8 bits each; grid
    strips sweep x monotonically so this superset bound is tight).
    Negative = skip. The kernel evaluates only fixed-width chunks of
    that range."""
    tiles_x = -(-width // tile)
    tiles_y = -(-height // tile)
    n_st = tiles_x * tiles_y
    I = bbox.shape[0]

    if order_key is not None:
        perm = jnp.argsort(
            jnp.where(usable, order_key, jnp.float32(jnp.inf))
        ).astype(jnp.int32)
        bbox = bbox[perm]
        usable = usable[perm]
        inst_ids = perm
    else:
        inst_ids = jnp.arange(I, dtype=jnp.int32)

    st = jnp.arange(n_st, dtype=jnp.int32)
    tx = (st % tiles_x).astype(jnp.float32) * tile
    ty = (st // tiles_x).astype(jnp.float32) * tile
    ovl = (
        (bbox[:, 0][None, :] <= (tx + tile - 1)[:, None])
        & (bbox[:, 2][None, :] >= tx[:, None])
        & (bbox[:, 1][None, :] <= (ty + tile - 1)[:, None])
        & (bbox[:, 3][None, :] >= ty[:, None])
        & usable[None, :]
    )  # (n_st, I)

    full = jnp.concatenate([jnp.ones((n_st, 1), bool), ovl], axis=1)
    flat = full.reshape(-1)
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
    count = pos[-1] + 1
    target = jnp.where(flat & (pos < max_work), pos, max_work)

    st_of = jnp.broadcast_to(st[:, None], (n_st, I + 1)).reshape(-1)
    inst_col = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), inst_ids]
    )
    inst_of = jnp.broadcast_to(inst_col[None, :], (n_st, I + 1)).reshape(-1)

    def scat(vals, fill):
        out = jnp.full((max_work + 1,), fill, jnp.int32)
        return out.at[target].set(vals, mode="drop")[:max_work]

    w_st = scat(st_of, n_st - 1)
    w_inst = scat(inst_of, -1)
    idx = jnp.arange(max_work, dtype=jnp.int32)
    in_range = idx < jnp.minimum(count, max_work)
    w_st = jnp.where(in_range, w_st, n_st - 1)
    w_inst = jnp.where(in_range, w_inst, -1)

    prev_st = jnp.concatenate([jnp.full((1,), -1, jnp.int32), w_st[:-1]])
    next_st = jnp.concatenate([w_st[1:], jnp.full((1,), -2, jnp.int32)])
    next_in_range = jnp.concatenate([in_range[1:], jnp.zeros((1,), bool)])
    first = (w_st != prev_st) & in_range
    # padding items reuse st = n_st-1: a group also ends where the next
    # item falls out of range
    last = ((w_st != next_st) | ~next_in_range) & in_range
    base_id = jnp.maximum(w_inst, 0) * tris_per_inst
    item_valid = (w_inst >= 0) & in_range

    # per-item batch/subtile ranges from the per-batch bboxes, so the
    # kernel's hot loops read only SMEM scalars (VMEM scalar extraction
    # measured ~1us each — it dominated the first kernel's runtime)
    if batch_meta is None:
        raise ValueError("batch_meta (from pack_tri_data) is required")
    n_batch = batch_meta.shape[1]
    inst_sel = jnp.maximum(w_inst, 0)
    bm = batch_meta[inst_sel]                     # (W, n_batch, 8)
    tx0 = (w_st % tiles_x).astype(jnp.float32) * tile
    ty0 = (w_st // tiles_x).astype(jnp.float32) * tile
    hit = (
        (bm[..., 0] <= tx0[:, None] + (tile - 1))
        & (bm[..., 2] >= tx0[:, None])
        & (bm[..., 1] <= ty0[:, None] + (tile - 1))
        & (bm[..., 3] >= ty0[:, None])
        & item_valid[:, None]
    )                                             # (W, n_batch)
    bidx = jnp.arange(n_batch, dtype=jnp.int32)[None, :]
    b_lo = jnp.min(jnp.where(hit, bidx, n_batch), axis=1)
    b_hi = jnp.max(jnp.where(hit, bidx, -1), axis=1)
    n_sub = tile // sub_h
    s_lo = jnp.clip(
        jnp.floor((bm[..., 1] - ty0[:, None]) / sub_h), 0, n_sub - 1
    ).astype(jnp.int32)
    s_hi = jnp.clip(
        jnp.floor((bm[..., 3] - ty0[:, None]) / sub_h), 0, n_sub - 1
    ).astype(jnp.int32)
    B = tris_per_inst // n_batch
    if tri_xspan is not None:
        spans = tri_xspan[inst_sel].reshape(max_work, n_batch, B, 2)
        tmask = (
            (spans[..., 0] <= tx0[:, None, None] + (tile - 1))
            & (spans[..., 1] >= tx0[:, None, None])
        )
        tidx = jnp.arange(B, dtype=jnp.int32)[None, None, :]
        t_lo = jnp.min(jnp.where(tmask, tidx, B), axis=-1)
        t_hi = jnp.max(jnp.where(tmask, tidx, -1), axis=-1)
        hit = hit & (t_lo <= t_hi)
    else:
        t_lo = jnp.zeros((max_work, n_batch), jnp.int32)
        t_hi = jnp.full((max_work, n_batch), B - 1, jnp.int32)
    packed_range = jnp.where(
        hit,
        s_lo | (s_hi << 5) | (t_lo << 10) | (t_hi << 18),
        jnp.int32(-1),
    )
    sub_range = packed_range.T                    # (n_batch, W)
    b_lo = jnp.where(item_valid, b_lo, n_batch)
    b_hi = jnp.where(item_valid, b_hi, -1)
    # conservative per-(item, tile) nearest depth for early-z: an item
    # strictly behind every pixel of a fully covered tile can never
    # win (nor tie), so skipping it is exactly lossless. Stored as
    # floor-quantized fixed point (Mosaic cannot bitcast scalars);
    # the kernel ceil-quantizes its side, keeping the skip strict.
    item_zmin = jnp.min(
        jnp.where(hit, bm[..., 4], jnp.float32(_FAR)), axis=1
    )
    item_zmin_q = jnp.floor(
        jnp.clip(item_zmin, 0.0, 2.0) * (1 << 20)
    ).astype(jnp.int32)

    meta = jnp.stack(
        [
            w_st,
            jnp.maximum(w_inst, 0),
            first.astype(jnp.int32),
            last.astype(jnp.int32),
            base_id,
            item_valid.astype(jnp.int32),
            w_st // tiles_x,
            w_st % tiles_x,
            b_lo,
            b_hi,
            item_zmin_q,
        ]
    )
    return WorkList(meta=meta, sub_range=sub_range, num_items=count)


def _raster_kernel(
    meta_ref,     # scalar prefetch (11, MAX_WORK) int32
    srange_ref,   # scalar prefetch (n_batch, MAX_WORK) int32
    tri_ref,      # (1, T, 48) one instance's packed tris
    z_ref,        # (TILE, TILE) out
    id_ref,       # (TILE, TILE) int32 out
    attr_ref,     # (16, TILE, TILE) out
    z_scr,        # scratch (n_sub, sub_px) f32 — lane-major subtile depth
    id_scr,       # scratch (n_sub, sub_px) i32
    coef_acc,     # scratch (n_sub, 32, sub_px) f32
    rhs_rel,      # scratch (48, 4 * sub_px) f32 — block-diag pixel matrix
    *,
    tile: int,
    sub_h: int,
    tri_batch: int,
    tris_per_inst: int,
    reverse_z: bool,
    wire_px: float,
):
    w = pl.program_id(0)
    first = meta_ref[2, w]
    last = meta_ref[3, w]
    base_id = meta_ref[4, w]
    ty = meta_ref[6, w]
    tx = meta_ref[7, w]
    b_lo = meta_ref[8, w]
    b_hi = meta_ref[9, w]

    n_sub = tile // sub_h
    P = sub_h * tile
    worst = -_FAR if reverse_z else _FAR
    B = tri_batch

    x0f = tx.astype(jnp.float32) * tile
    y0f = ty.astype(jnp.float32) * tile

    # one-time constant for the whole launch (scratch persists across the
    # sequential grid): block-diagonal SUBTILE-RELATIVE pixel matrix,
    # RHS[row, q*P + p] for quantities q in (e0, e1, e2, z):
    #   row == 3q     -> dx(p) + .5   (pixel x within the subtile)
    #   row == 3q + 1 -> dy(p) + .5
    #   row == 3q + 2 -> 0            (constant terms live in the origin
    #                                  offsets added per subtile)
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
        id_scr[:] = jnp.full((n_sub, P), _BIG_ID, jnp.int32)
        coef_acc[:] = jnp.zeros_like(coef_acc)

    W_E = min(64, B)  # evaluation chunk width (rows of triangles)
    tri_iota = jax.lax.broadcasted_iota(jnp.int32, (W_E, P), 0)

    # exact early-z: an item strictly behind every current depth in the
    # tile cannot win or tie anywhere (ties need z == stored z <= tile
    # max < item zmin — contradiction). One (n_sub, P) reduce + scalar
    # per item; near-to-far ordering makes occluded instances skip
    # outright. Fixed-point with opposing roundings keeps it strict.
    # (Disabled under reverse-z: the stored bound is a near-depth min.)
    item_valid_f = meta_ref[5, w]
    if reverse_z:
        run_item = item_valid_f == 1
    else:
        zmin_q = meta_ref[10, w]
        z_edge = jnp.max(z_scr[:])
        edge_q = jnp.ceil(
            jnp.clip(z_edge, 0.0, 2.0) * (1 << 20)
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
            n_chunks = (t_hi - t_lo + W_E) // W_E  # = cdiv(count, W_E)

            def chunk_body(k, _):
                # fixed-width slice clamped into the batch; overlapping
                # chunks re-evaluate the same triangles, which the merge
                # is idempotent to
                t0 = jnp.minimum(b * B + t_lo + k * W_E, b * B + B - W_E)
                blk = tri_ref[0, pl.ds(t0, W_E), :]  # (W_E, 48)
                # all edge/z values at subtile-relative pixel positions:
                # one MXU matmul for the chunk
                erel = jax.lax.dot_general(
                    blk, rhs_rel[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (W_E, 4P)
                live = blk[:, _R_VALID:_R_VALID + 1] > 0.0  # (W_E, 1)
                coefs = blk[:, _R_COEF:_R_COEF + NUM_COEF]  # (W_E, 27)

                def sub_body(sidx, _):
                    sy0 = y0f + sidx.astype(jnp.float32) * sub_h

                    def off(base):
                        return (
                            blk[:, base:base + 1] * x0f
                            + blk[:, base + 1:base + 2] * sy0
                            + blk[:, base + 2:base + 3]
                        )  # (W_E, 1)

                    e0 = erel[:, 0 * P:1 * P] + off(_R_EDGE + 0)
                    e1 = erel[:, 1 * P:2 * P] + off(_R_EDGE + 3)
                    e2 = erel[:, 2 * P:3 * P] + off(_R_EDGE + 6)
                    zq = erel[:, 3 * P:4 * P] + off(_R_Z)

                    m = jnp.minimum(e0, jnp.minimum(e1, e2))
                    # zq >= 0 is the near plane (clipless crossing tris;
                    # see ops/raster.py setup docstring)
                    cover = (m >= 0.0) & live & (zq >= 0.0)
                    if wire_px > 0.0:
                        cover = cover & (m <= wire_px)
                    zv = jnp.where(cover, zq, worst)

                    if reverse_z:
                        z_best = jnp.max(zv, axis=0, keepdims=True)
                    else:
                        z_best = jnp.min(zv, axis=0, keepdims=True)
                    idx = jnp.min(
                        jnp.where(zv == z_best, tri_iota, W_E), axis=0,
                        keepdims=True,
                    )  # (1, P)
                    covered = idx < W_E
                    gid = jnp.where(covered, base_id + t0 + idx, _BIG_ID)

                    zs = z_scr[pl.ds(sidx, 1), :]
                    ids = id_scr[pl.ds(sidx, 1), :]
                    if reverse_z:
                        better = z_best > zs
                    else:
                        better = z_best < zs
                    upd = covered & (
                        better | ((z_best == zs) & (gid < ids))
                    )

                    onehot = (tri_iota == idx).astype(jnp.float32)
                    # exact f32 coefficient swap in two DEFAULT-precision
                    # (bf16) matmuls: the one-hot factor is exactly
                    # representable, so splitting the coefficients hi/lo
                    # loses nothing at 1/3 the HIGHEST-precision cost
                    coef_hi = coefs.astype(jnp.bfloat16).astype(jnp.float32)
                    coef_lo = coefs - coef_hi
                    dims = (((0,), (0,)), ((), ()))
                    new_coef = jax.lax.dot_general(
                        coef_hi, onehot, dims,
                        preferred_element_type=jnp.float32,
                    ) + jax.lax.dot_general(
                        coef_lo, onehot, dims,
                        preferred_element_type=jnp.float32,
                    )  # (27, P)
                    acc = coef_acc[pl.ds(sidx, 1), 0:NUM_COEF, :]
                    coef_acc[pl.ds(sidx, 1), 0:NUM_COEF, :] = jnp.where(
                        upd[None], new_coef[None], acc
                    )
                    z_scr[pl.ds(sidx, 1), :] = jnp.where(upd, z_best, zs)
                    id_scr[pl.ds(sidx, 1), :] = jnp.where(upd, gid, ids)
                    return 0

                jax.lax.fori_loop(s_lo, s_hi + 1, sub_body, 0)
                return 0

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
        for s in range(n_sub):
            sy0 = y0f + s * sub_h
            dxl = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
            px = (dxl % tile).astype(jnp.float32) + 0.5 + x0f
            py = (dxl // tile).astype(jnp.float32) + 0.5 + sy0
            coef = coef_acc[s, 0:NUM_COEF, :]  # SoA: a[9]; b[9]; c[9]
            vals = coef[0:9, :] * px + coef[9:18, :] * py + coef[18:27, :]
            out = jnp.concatenate(
                [vals, jnp.zeros((7, P), jnp.float32)], axis=0
            )
            attr_ref[:, s * sub_h:(s + 1) * sub_h, :] = out.reshape(
                16, sub_h, tile
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tile", "sub_h", "tri_batch", "reverse_z",
        "max_work", "interpret", "wire_px",
    ),
)
def rasterize_pallas(
    packed: PackedTris,
    work: WorkList,
    width: int,
    height: int,
    tile: int = 128,
    sub_h: int = 8,
    tri_batch: int = 128,
    reverse_z: bool = False,
    max_work: int = 2048,
    interpret: bool = False,
    wire_px: float = 0.0,
):
    """Returns (z (H, W), id (H, W) i32 [-1 = background], attrs (H, W, 8),
    inv_w (H, W)). H/W are padded to tile multiples then cropped."""
    tri_data = packed.tri_data
    batch_meta = packed.batch_meta
    I, T, C = tri_data.shape
    assert C == _R_TOTAL
    # scalar-prefetch operands live in SMEM (~1 MB total on v5e)
    smem_bytes = (11 + T // tri_batch) * max_work * 4
    assert smem_bytes < 900_000, (
        f"work-list scalars need {smem_bytes}B of ~1MB SMEM; reduce "
        f"max_work or increase tri_batch"
    )
    n_batch = T // tri_batch
    pad_w = -(-width // tile) * tile
    pad_h = -(-height // tile) * tile
    n_sub = tile // sub_h
    P = sub_h * tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(max_work,),
        in_specs=[
            pl.BlockSpec(
                (1, T, _R_TOTAL), lambda w, meta, sr: (meta[1, w], 0, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile, tile), lambda w, meta, sr: (meta[6, w], meta[7, w])
            ),
            pl.BlockSpec(
                (tile, tile), lambda w, meta, sr: (meta[6, w], meta[7, w])
            ),
            pl.BlockSpec(
                (16, tile, tile),
                lambda w, meta, sr: (0, meta[6, w], meta[7, w]),
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_sub, P), jnp.float32),
            pltpu.VMEM((n_sub, P), jnp.int32),
            pltpu.VMEM((n_sub, 32, P), jnp.float32),
            pltpu.VMEM((48, 4 * P), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _raster_kernel,
        tile=tile,
        sub_h=sub_h,
        tri_batch=tri_batch,
        tris_per_inst=T,
        reverse_z=reverse_z,
        wire_px=wire_px,
    )
    z, idb, attr = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.int32),
            jax.ShapeDtypeStruct((16, pad_h, pad_w), jnp.float32),
        ],
        interpret=interpret,
    )(work.meta, work.sub_range, tri_data)

    z = z[:height, :width]
    idb = idb[:height, :width]
    attr = attr[:, :height, :width]
    worst = -F32_FAR if reverse_z else F32_FAR
    background = z == worst
    idb = jnp.where(background, jnp.int32(-1), idb)
    inv_w = attr[0]
    denom = jnp.where(jnp.abs(inv_w) > 1e-20, inv_w, 1.0)
    attrs = jnp.moveaxis(attr[1:9], 0, -1) / denom[..., None]
    return z, idb, attrs, inv_w
