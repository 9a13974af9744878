"""TPU fast-path rasterizer: a fused Pallas kernel.

Replaces the reference's hardware rasterization + depth test behind
drawIndexed (TerrainPass.cpp:215-222) with a single Pallas kernel that is
shaped entirely by measured v5e costs (no scatter ~0.15G el/s, no gather,
no global sort ~2.8ms/1.5M — all poison; dense VPU/MXU work is cheap).

Structure:

* Screen is divided into 128x128-pixel supertiles. Instances (terrain
  patches) are binned to supertiles by screen bbox with a cheap dense
  [instances x supertiles] overlap test + compaction into a flat,
  supertile-major WORK LIST of (supertile, instance) pairs — a few
  thousand elements, built with one tiny cumsum/scatter in XLA.
* The kernel runs one grid step per work item. Scalar-prefetched work
  metadata drives the input index_map, so each step DMAs exactly one
  instance's triangle-setup block (block-sparse pattern). Consecutive
  steps share the same supertile, so the z/id/attribute output blocks
  stay resident in VMEM across the whole group (Pallas revisiting).
* Inside a step: the instance's triangles are processed in batches of
  TRI_BATCH against each 8x128 subtile the batch's bbox overlaps
  (predicated with pl.when). A batch-vs-subtile evaluation is pure
  VPU/MXU work over [TRI_BATCH, 8, 128] blocks: affine edge/depth
  evaluation by broadcast FMA, coverage masking, min + masked-iota-min
  for a deterministic (z, lowest-id) winner, and a one-hot [pixels x
  tris] @ [tris x 27] MXU matmul that swaps the winner's interpolation
  PLANE COEFFICIENTS into a per-pixel accumulator. Attributes therefore
  resolve in the same pass as depth — no second geometry sweep, no
  per-pixel gather. At the group's last work item the accumulated planes
  are evaluated at pixel coordinates and written out.

Depth convention matches ops/raster.py (and the reference's
LessOrEqual / GreaterOrEqual PipelineKey bits, TerrainPass.cpp:478-482).
Semantics are oracle-tested against ops/raster.rasterize_xla.
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
_R_COEF = 12         # 27: [inv_w, attr0..7] planes x (a, b, c)
_R_VALID = 39        # 1
_R_BBOX = 40         # 4: x0, y0, x1, y1 (pixels)
_R_TOTAL = 48

NUM_COEF = 27        # inv_w + 8 attrs, 3 coefficients each
_BIG_ID = jnp.int32(2**31 - 1)


def pack_tri_data(setup: TriSetup, num_instances: int, tris_per_inst: int) -> jnp.ndarray:
    """TriSetup (flat I*T) -> [I, T, 48] f32 block-sparse layout."""
    n = num_instances * tris_per_inst
    ok = setup.valid[:, None]
    # Invalid triangles (w <= eps, degenerate, culled) can carry inf/NaN
    # plane coefficients; zero them so the kernel's one-hot coefficient
    # matmul (which contracts over the whole batch) never sees NaN.
    edge = jnp.where(ok, setup.edge.reshape(n, 9), 0.0)
    planes3 = jnp.where(ok[:, :, None], setup.planes, 0.0)  # (n, 10, 3)
    z = planes3[:, 0, :]
    # coefficient rows stored structure-of-arrays: [a0..a8, b0..b8, c0..c8]
    # so the kernel's finalize reads contiguous slices (strided sublane
    # slices lower to unsupported gathers in Mosaic)
    coef = jnp.swapaxes(planes3[:, 1:10, :], 1, 2).reshape(n, 27)
    valid = setup.valid.astype(jnp.float32)[:, None]
    bbox = jnp.where(ok, setup.bbox, 0.0)
    pad = jnp.zeros((n, _R_TOTAL - 44), jnp.float32)
    packed = jnp.concatenate([edge, z, coef, valid, bbox, pad], axis=1)
    return packed.reshape(num_instances, tris_per_inst, _R_TOTAL)


class WorkList(NamedTuple):
    """Flat supertile-major work items. meta rows: st, inst, first, last,
    base_id, item_valid, tile_y, tile_x."""

    meta: jnp.ndarray       # (8, MAX_WORK) int32
    num_items: jnp.ndarray  # () int32 (pre-clamp; > MAX_WORK means overflow)


def instance_screen_bbox(
    world: jnp.ndarray, world_to_clip: jnp.ndarray, width: int, height: int,
    inst_valid: jnp.ndarray, w_eps: float = 1e-4,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Conservative per-instance pixel bbox from its lattice vertices.

    Only vertices in front of the near plane (w > eps) contribute:
    triangles touching any w <= eps vertex are culled by setup_triangles
    and never rasterize, so the renderable extent is covered by the
    in-front vertex set. (This matters: quadtree nodes emitted by their
    parent are not frustum-tested — QuadTree.cpp:122-126 — and routinely
    sit behind the camera; a full-screen fallback bbox for them floods
    the raster work list.)
    Returns (bbox (I, 4) f32, usable (I,) bool).
    """
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
    on = (x1 >= 0) & (y1 >= 0) & (x0 < width) & (y0 < height)
    any_front = jnp.any(front, axis=1)
    return jnp.stack([x0, y0, x1, y1], axis=-1), inst_valid & on & any_front


def build_work_list(
    bbox: jnp.ndarray,        # (I, 4) pixel bbox
    usable: jnp.ndarray,      # (I,)
    width: int, height: int,
    tile: int = 128,
    tris_per_inst: int = 2048,
    max_work: int = 2048,
) -> WorkList:
    """Supertile-major (st, instance) pairs, one leading dummy per
    supertile (carries the buffer-init flag even for empty tiles)."""
    tiles_x = -(-width // tile)
    tiles_y = -(-height // tile)
    n_st = tiles_x * tiles_y
    I = bbox.shape[0]

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

    # prepend a dummy column: always-present first entry per supertile
    full = jnp.concatenate([jnp.ones((n_st, 1), bool), ovl], axis=1)
    flat = full.reshape(-1)
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
    count = pos[-1] + 1
    target = jnp.where(flat & (pos < max_work), pos, max_work)

    st_of = jnp.broadcast_to(st[:, None], (n_st, I + 1)).reshape(-1)
    inst_of = jnp.broadcast_to(
        jnp.arange(-1, I, dtype=jnp.int32)[None, :], (n_st, I + 1)
    ).reshape(-1)

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
    # padding items reuse st = n_st-1, so a group also ends where the next
    # item falls out of range
    last = ((w_st != next_st) | ~next_in_range) & in_range
    base_id = jnp.maximum(w_inst, 0) * tris_per_inst
    item_valid = (w_inst >= 0) & in_range
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
        ]
    )
    return WorkList(meta=meta, num_items=count)


def _raster_kernel(
    meta_ref,     # scalar prefetch (8, MAX_WORK) int32
    tri_ref,      # (1, T, 48) one instance's packed tris
    z_ref,        # (TILE, TILE)
    id_ref,       # (TILE, TILE) int32
    attr_ref,     # (16, TILE, TILE)
    coef_acc,     # scratch (16, 32, 1024): per-subtile [27, 8*128] coefs
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
    item_valid = meta_ref[5, w]
    ty = meta_ref[6, w]
    tx = meta_ref[7, w]

    n_sub = tile // sub_h
    n_batch = tris_per_inst // tri_batch
    far = 3.0e38
    worst = -far if reverse_z else far
    big_id = 2**31 - 1

    x0f = tx.astype(jnp.float32) * tile
    y0f = ty.astype(jnp.float32) * tile

    @pl.when(first == 1)
    def _init():
        z_ref[:] = jnp.full((tile, tile), worst, jnp.float32)
        id_ref[:] = jnp.full((tile, tile), big_id, jnp.int32)
        coef_acc[:] = jnp.zeros_like(coef_acc)

    # pixel-center coordinate fields for one subtile, (B-broadcastable)
    # (tpu.iota is integer-only; cast after)
    ysub = jax.lax.broadcasted_iota(
        jnp.int32, (1, sub_h, tile), 1
    ).astype(jnp.float32) + 0.5
    xsub = jax.lax.broadcasted_iota(
        jnp.int32, (1, sub_h, tile), 2
    ).astype(jnp.float32) + 0.5
    tri_iota = jax.lax.broadcasted_iota(
        jnp.int32, (tri_batch, sub_h, tile), 0
    )

    @pl.when(item_valid == 1)
    def _process():
        for b in range(n_batch):
            blk = tri_ref[0, b * tri_batch:(b + 1) * tri_batch, :]  # (B, 48)
            live = blk[:, _R_VALID] > 0.0  # (B,)
            bb = blk[:, _R_BBOX:_R_BBOX + 4]  # (B, 4)
            big = jnp.where(live[:, None], bb, jnp.float32(0.0))
            # batch-level conservative bbox (only over live tris)
            bx0 = jnp.min(jnp.where(live, bb[:, 0], far))
            by0 = jnp.min(jnp.where(live, bb[:, 1], far))
            bx1 = jnp.max(jnp.where(live, bb[:, 2], -far))
            by1 = jnp.max(jnp.where(live, bb[:, 3], -far))
            del big
            batch_hits_x = (bx0 <= x0f + (tile - 1)) & (bx1 >= x0f)

            for s in range(n_sub):
                sy0 = y0f + s * sub_h
                hit = (
                    batch_hits_x
                    & (by0 <= sy0 + (sub_h - 1))
                    & (by1 >= sy0)
                )

                @pl.when(hit)
                def _eval(b=b, s=s, blk=blk, live=live):
                    px = xsub + x0f                    # (1, 8, 128)
                    py = ysub + (y0f + s * sub_h)

                    def affine(col):
                        a = blk[:, col][:, None, None]
                        bc = blk[:, col + 1][:, None, None]
                        c = blk[:, col + 2][:, None, None]
                        return a * px + bc * py + c    # (B, 8, 128)

                    e0 = affine(_R_EDGE)
                    e1 = affine(_R_EDGE + 3)
                    e2 = affine(_R_EDGE + 6)
                    cover = (
                        (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
                        & live[:, None, None]
                    )
                    if wire_px > 0.0:
                        # wireframe fill mode: edges are normalized to
                        # pixel distance at setup
                        cover = cover & (
                            jnp.minimum(e0, jnp.minimum(e1, e2)) <= wire_px
                        )
                    zv = affine(_R_Z)
                    zv = jnp.where(cover, zv, worst)

                    if reverse_z:
                        z_best = jnp.max(zv, axis=0)   # (8, 128)
                    else:
                        z_best = jnp.min(zv, axis=0)
                    win = zv == z_best[None, :, :]
                    # deterministic lowest-index winner
                    idx = jnp.min(
                        jnp.where(win, tri_iota, jnp.int32(tris_per_inst)),
                        axis=0,
                    )  # (8, 128)
                    onehot = (tri_iota == idx[None, :, :]).astype(jnp.float32)

                    covered = idx < tris_per_inst
                    gid = jnp.where(
                        covered, base_id + b * tri_batch + idx, big_id
                    )

                    zs = z_ref[s * sub_h:(s + 1) * sub_h, :]
                    ids = id_ref[s * sub_h:(s + 1) * sub_h, :]
                    if reverse_z:
                        better = z_best > zs
                    else:
                        better = z_best < zs
                    upd = covered & (better | ((z_best == zs) & (gid < ids)))

                    # winner's 27 interpolation coefficients via one MXU
                    # matmul: [27, B] @ [B, P]
                    coefs = blk[:, _R_COEF:_R_COEF + NUM_COEF]  # (B, 27)
                    oh = onehot.reshape(tri_batch, sub_h * tile)
                    # HIGHEST: default MXU precision truncates the f32
                    # coefficients to bf16 (measured 0.67 abs attr error)
                    new_coef = jax.lax.dot_general(
                        coefs, oh, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # (27, P)
                    # bool reshapes (sublane->lane relayout on i1) are
                    # unsupported in Mosaic; go through f32
                    updf = upd.astype(jnp.float32).reshape(
                        1, sub_h * tile
                    ) > 0.5
                    acc = coef_acc[s, 0:NUM_COEF, :]
                    coef_acc[s, 0:NUM_COEF, :] = jnp.where(
                        updf, new_coef, acc
                    )
                    z_ref[s * sub_h:(s + 1) * sub_h, :] = jnp.where(
                        upd, z_best, zs
                    )
                    id_ref[s * sub_h:(s + 1) * sub_h, :] = jnp.where(
                        upd, gid, ids
                    )

    @pl.when(last == 1)
    def _finalize():
        for s in range(n_sub):
            sy0 = y0f + s * sub_h
            px = (xsub + x0f).reshape(1, sub_h * tile)
            py = (ysub + sy0).reshape(1, sub_h * tile)
            coef = coef_acc[s, 0:NUM_COEF, :]  # (27, P), SoA: a[9];b[9];c[9]
            a = coef[0:9, :]
            bcf = coef[9:18, :]
            c = coef[18:27, :]
            vals = a * px + bcf * py + c       # (9, P)
            out = jnp.concatenate(
                [vals, jnp.zeros((7, sub_h * tile), jnp.float32)], axis=0
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
    tri_data: jnp.ndarray,     # (I, T, 48) packed setup
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
    inv_w (H, W)). H/W are padded up to tile multiples then cropped."""
    I, T, C = tri_data.shape
    assert C == _R_TOTAL
    pad_w = -(-width // tile) * tile
    pad_h = -(-height // tile) * tile
    tiles_x = pad_w // tile
    tiles_y = pad_h // tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(max_work,),
        in_specs=[
            pl.BlockSpec(
                (1, T, _R_TOTAL),
                lambda w, meta: (meta[1, w], 0, 0),
            ),
        ],
        out_specs=[
            pl.BlockSpec((tile, tile), lambda w, meta: (meta[6, w], meta[7, w])),
            pl.BlockSpec((tile, tile), lambda w, meta: (meta[6, w], meta[7, w])),
            pl.BlockSpec(
                (16, tile, tile), lambda w, meta: (0, meta[6, w], meta[7, w])
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile // sub_h, 32, sub_h * tile), jnp.float32),
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
    )(work.meta, tri_data)

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
