"""TPU fast-path rasterizer: a fused Pallas kernel with per-subtile
triangle compaction.

Replaces the reference's hardware rasterization + depth test behind
drawIndexed (TerrainPass.cpp:215-222) with a single Pallas kernel shaped
entirely by measured v5e costs (scatter ~0.15G el/s, gather ~0.15G el/s,
sort 2.8ms/1.5M — all banned from the frame path; MXU matmuls at
198 TFLOP/s are nearly free).

Structure:

* Screen is divided into 128x128-pixel supertiles. Instances are binned
  to supertiles by screen bbox ([instances x supertiles] dense overlap +
  cumsum compaction) into a flat, supertile-major work list ordered
  near-to-far within each tile (so early-z can reject occluded items).
* One grid step per (instance, supertile) work item. Scalar-prefetched
  metadata drives the input index_maps (block-sparse DMA of one
  instance's triangle data); consecutive steps share a supertile so its
  z/id/coefficient state stays VMEM-resident.
* Per (item, subtile), the relevant triangles (those whose bbox touches
  the 8-pixel-high subtile row — typically 10-40 of the instance's 2048)
  are COMPACTED into fixed-width groups of K via a rank-from-cumsum
  one-hot MXU matmul: rank = prefix-sum of the subtile's incidence mask,
  one_hot[k, t] = (rank[t] == r*K + k), compacted = one_hot @ tri_data.
  This is the difference between sweeping every (batch, subtile) pair
  densely (the round-1 kernel: ~57k evaluations of (64 tris, 1024 px)
  per 1080p frame) and evaluating only ~7k compacted groups.
* Compaction is kept essentially exact in f32 by pre-splitting the f32
  triangle data into three bf16 terms host-side (hi = bf16(x),
  mid = bf16(x - hi), lo = bf16(x - hi - mid)) and summing the three
  one-hot matmuls lowest-term-first: each product is exact (the one-hot
  factor is 0/1), and the ascending reassociation bounds the residual by
  |x - hi - mid - lo| <= 2^-27 |x| — below f32 ulp, so compacted
  coefficients match the originals to <= 1 ulp on hardware and exactly
  under CPU interpret (where the dots run in f32).
* Edge/depth evaluation rides the MXU: each compacted group's 12 affine
  coefficients (3 edges + z plane) are multiplied once against a
  constant block-diagonal SUBTILE-RELATIVE pixel matrix (48 x 4*1024),
  yielding all edge/z values for every pixel of the 8x128 subtile at
  once; per subtile only broadcast origin offsets remain. The VPU does
  just the coverage/min/merge chain.
* Attributes resolve in the same pass: a one-hot [27 x K] @ [K x 1024]
  MXU matmul swaps the depth winner's interpolation PLANE COEFFICIENTS
  into the per-pixel accumulator (exactly-one-hot via masked-iota-min;
  ties break to the lowest triangle id). The winner's original triangle
  index rides two bf16-exact id channels through the same matmul.
* Per-(item, subtile) round counts (ceil(count / K)) are precomputed
  host-side into scalar-prefetch SMEM, so the kernel's hot loops read
  only cheap SMEM scalars (VMEM scalar extraction measured ~1 us each).
  Compaction makes the group loop exact: no work-list-range overflow
  can drop triangles.
* Early-z: items strictly behind a fully covered tile are skipped
  exactly (fixed-point bounds with opposing roundings; near-to-far item
  order makes occluded instances skip outright).

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

# packed tri-data rows (last axis of the [I, T, 48] layout; carried to the
# kernel as three bf16 split terms, see pack_tri_data)
_R_EDGE = 0          # 9: three edges x (a, b, c)
_R_Z = 9             # 3: z plane
_R_COEF = 12         # 27: [inv_w, attr0..7] planes, SoA (a[9], b[9], c[9])
_R_VALID = 39        # 1
_R_ID = 40           # 2: local tri index t split as ((t//256)*256, t%256)
                     #    (each term bf16-exact so id survives the one-hot
                     #    matmuls without rounding)
_R_BBOX = 42         # 4: per-tri pixel bbox (x0, y0, x1, y1) — the
                     #    coverage scissor (near-parallel sliver edges can
                     #    round to >= 0 far outside the triangle)
_R_TOTAL = 48

# tri_cols rows (the [I, 8, T] lane-major layout the kernel builds subtile
# incidence masks from; T on lanes so ranks/one-hots need no transposes)
_C_X0, _C_Y0, _C_X1, _C_Y1, _C_VALID = 0, 1, 2, 3, 4
_C_ROWS = 8

# batch-meta rows (per tri_batch triangles): bbox + z range (host-side
# only: feeds the work-list builder's per-item conservative zmin)
_BM_COLS = 8         # x0, y0, x1, y1, zmin, zmax, pad, pad

NUM_COEF = 27        # inv_w + 8 attrs, 3 coefficients each
_FAR = 3.0e38
_BIG_ID = 2**31 - 1


class PackedTris(NamedTuple):
    tri_data: jnp.ndarray     # (I, 48, T) f32 — packed rows (see _R_*),
                              #   COMPONENT-MAJOR (T on lanes): every
                              #   producer in triangle setup is an (I, T)
                              #   component array, so this layout writes
                              #   linearly; a (T, 48) row-major layout
                              #   forces a lane-misaligned transpose at
                              #   the pallas boundary measured at ~30 ms
                              #   per 1080p frame. The kernel's compaction
                              #   dots consume it NT (contract on lanes).
                              #   bf16 term-split happens IN-KERNEL
                              #   (host-side splitting costs ~5 GB/frame).
    tri_cols: jnp.ndarray     # (I, 8, T) f32 — bbox/valid, lane-major
    batch_meta: jnp.ndarray   # (I, n_batch, 8) f32


def _split3_bf16(x: jnp.ndarray):
    """f32 -> three bf16 terms with x == hi + mid + lo EXACTLY.

    Truncation split by mantissa masking: bf16 is the top 16 bits of f32,
    so masking the low 16 bits yields a bf16-exact value and an exactly
    representable remainder; three 8-bit chunks cover the full 24-bit f32
    significand. Bit-masking instead of f32->bf16->f32 casts matters:
    XLA's default --xla_allow_excess_precision folds the cast round-trip
    into identity on TPU, silently zeroing the mid/lo terms (observed as
    a 2^-8 relative z error on hardware). The only residual inexactness
    is bf16-subnormal flushing for |term| < 2^-126 — far below any
    coefficient this kernel consumes."""
    def trunc(v):
        u = jax.lax.bitcast_convert_type(v, jnp.uint32)
        return jax.lax.bitcast_convert_type(
            u & jnp.uint32(0xFFFF0000), jnp.float32
        )

    hi = trunc(x)
    r1 = x - hi
    mid = trunc(r1)
    lo = r1 - mid
    return (
        hi.astype(jnp.bfloat16),
        mid.astype(jnp.bfloat16),
        lo.astype(jnp.bfloat16),
    )


def _cols_and_batch_meta(okf, bbox, zplane, tri_batch):
    """tri_cols (I, 8, T) + batch_meta (I, nb, 8) from (I, T) component
    maps: ``bbox`` = (x0, y0, x1, y1) per-tri pixel bboxes, ``zplane`` =
    (a, b, c) of the z plane. ONE implementation for both packers
    (pack_tri_data / pack_components) — the kernel's subtile masks and
    the work-list builder's early-z bounds must agree with it exactly.

    batch_meta: per-tri_batch conservative screen bbox + z range
    (item-level early-z bound). Component form throughout: (I, nb, B)
    maps, never a 4-wide minor axis (tiny trailing dims land in padded
    TPU tiles). The z range evaluates the affine z plane at the four
    bbox corners of each tri (extrema of an affine map on a box)."""
    I, T = okf.shape
    zero_ch = jnp.zeros((I, T), jnp.float32)

    def col(c, fill):
        return jnp.where(okf, bbox[c], fill)

    tri_cols = jnp.stack(
        [col(0, _FAR), col(1, _FAR), col(2, -_FAR), col(3, -_FAR),
         okf.astype(jnp.float32), zero_ch, zero_ch, zero_ch],
        axis=1,
    )  # (I, 8, T)

    nb = T // tri_batch
    vb = okf.reshape(I, nb, tri_batch)

    def bcol(c, fill):
        return jnp.where(vb, bbox[c].reshape(I, nb, tri_batch), fill)

    tx0 = bcol(0, _FAR)
    ty0 = bcol(1, _FAR)
    tx1 = bcol(2, -_FAR)
    ty1 = bcol(3, -_FAR)
    bx0 = jnp.min(tx0, axis=-1)
    by0 = jnp.min(ty0, axis=-1)
    bx1 = jnp.max(tx1, axis=-1)
    by1 = jnp.max(ty1, axis=-1)
    za = jnp.where(vb, zplane[0].reshape(I, nb, tri_batch), 0.0)
    zb = jnp.where(vb, zplane[1].reshape(I, nb, tri_batch), 0.0)
    zc_ = jnp.where(vb, zplane[2].reshape(I, nb, tri_batch), 0.0)
    zmin_t = jnp.full_like(za, _FAR)
    zmax_t = jnp.full_like(za, -_FAR)
    for xi, yi in ((tx0, ty0), (tx0, ty1), (tx1, ty0), (tx1, ty1)):
        zq = za * xi + zb * yi + zc_
        zmin_t = jnp.minimum(zmin_t, zq)
        zmax_t = jnp.maximum(zmax_t, zq)
    zmin_t = jnp.where(vb, zmin_t, _FAR)
    zmax_t = jnp.where(vb, zmax_t, -_FAR)
    bzmin = jnp.min(zmin_t, axis=-1)
    bzmax = jnp.max(zmax_t, axis=-1)
    zero_b = jnp.zeros_like(bx0)
    batch_meta = jnp.stack(
        [bx0, by0, bx1, by1, bzmin, bzmax, zero_b, zero_b], axis=-1
    )
    return tri_cols, batch_meta


def pack_tri_data(
    setup: TriSetup, num_instances: int, tris_per_inst: int,
    tri_batch: int = 128,
) -> PackedTris:
    """TriSetup (flat I*T) -> block-sparse kernel layout + batch metadata.

    Invalid triangles (w <= eps, degenerate, culled) can carry inf/NaN
    coefficients; they are zeroed so the kernel's one-hot compaction
    matmul (which contracts the whole instance) never sees NaN (the MXU
    turns 0 * NaN into NaN)."""
    n = num_instances * tris_per_inst
    I, T = num_instances, tris_per_inst
    okf = setup.valid.reshape(I, T)

    # component-major channel maps, each an (I, T) array built from a
    # strided slice of the setup — no concat/swizzle intermediates, so
    # the whole pack fuses into one linear (I, 48, T) write (see
    # PackedTris docstring). The channel order is the _R_* layout:
    # 9 edges, 3 z, 27 coefs SoA (a[9], b[9], c[9] — strided sublane
    # slices lower to gathers in Mosaic), valid, 2 ids, 4 bbox, 2 pad.
    def ch(x):  # zero invalid lanes (NaN-poisoned coefficients)
        return jnp.where(okf, x.reshape(I, T), 0.0)

    chans = []
    for e in range(3):
        for c in range(3):
            chans.append(ch(setup.edge[:, e, c]))
    for c in range(3):
        chans.append(ch(setup.planes[:, 0, c]))
    for c in range(3):
        for q in range(9):
            chans.append(ch(setup.planes[:, 1 + q, c]))
    chans.append(okf.astype(jnp.float32))
    t_local = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.float32)[None, :], (I, T)
    )
    chans.append((t_local // 256.0) * 256.0)
    chans.append(t_local % 256.0)
    for c in range(4):
        chans.append(ch(setup.bbox[:, c]))
    zero_ch = jnp.zeros((I, T), jnp.float32)
    chans += [zero_ch] * (_R_TOTAL - _R_BBOX - 4)
    tri_data = jnp.stack(chans, axis=1)  # (I, 48, T)

    tri_cols, batch_meta = _cols_and_batch_meta(
        okf,
        tuple(setup.bbox[:, c].reshape(I, T) for c in range(4)),
        tuple(setup.planes[:, 0, c].reshape(I, T) for c in range(3)),
        tri_batch,
    )
    return PackedTris(
        tri_data=tri_data, tri_cols=tri_cols, batch_meta=batch_meta
    )


def pack_components(
    comp, tri_batch: int = 128,
) -> PackedTris:
    """TriComponents -> PackedTris without materializing a stacked
    TriSetup. Every channel is already an (I, T) map with T on lanes, so
    the (I, 48, T) tri_data write is one linear pass — the fused
    replacement for setup_triangles + pack_tri_data on the fast path
    (the stacked (N, 3, 3)/(N, C, 3) intermediates cost ~4 ms/frame of
    pure relayout at 1080p). Channel layout and zero-invalid semantics
    identical to pack_tri_data."""
    okf = comp.valid                      # (I, T)
    I, T = okf.shape
    nq = len(comp.quant)
    assert nq == NUM_COEF // 3 + 1, (
        f"pack_components expects z + {NUM_COEF // 3} quantities, got {nq}"
    )

    def ch(x):  # zero invalid lanes (NaN-poisoned coefficients)
        return jnp.where(okf, x, 0.0)

    chans = [ch(m) for m in comp.edge]              # 9 edge coefficients
    zpl = comp.quant[0]
    chans += [ch(zpl[c]) for c in range(3)]         # z plane
    for c in range(3):                              # 27 coefs SoA (a,b,c)
        for q in range(1, nq):
            chans.append(ch(comp.quant[q][c]))
    chans.append(okf.astype(jnp.float32))
    t_local = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.float32)[None, :], (I, T)
    )
    chans.append((t_local // 256.0) * 256.0)
    chans.append(t_local % 256.0)
    for c in range(4):
        chans.append(ch(comp.bbox[c]))
    zero_ch = jnp.zeros((I, T), jnp.float32)
    chans += [zero_ch] * (_R_TOTAL - _R_BBOX - 4)
    tri_data = jnp.stack(chans, axis=1)  # (I, 48, T)

    tri_cols, batch_meta = _cols_and_batch_meta(
        okf, tuple(comp.bbox[c] for c in range(4)),
        tuple(zpl[c] for c in range(3)), tri_batch,
    )
    return PackedTris(
        tri_data=tri_data, tri_cols=tri_cols, batch_meta=batch_meta
    )


def instance_bbox_components(
    comp, width: int, height: int, inst_valid: jnp.ndarray,
    w_eps: float = 1e-4,
):
    """instance_screen_bbox from TriComponents.vert_clip — component-form
    (four (I, V) maps), so no (I, V, 4) stacked clip tensor is ever
    materialized. Same semantics: in-front hull + full-frame widening for
    near-plane-crossing instances, 1px conservative padding."""
    cx, cy, _, cw = comp.vert_clip        # (I, V) each
    front = cw > w_eps
    big = 1e9
    inv_w = 1.0 / jnp.where(front, cw, 1.0)
    sx = (cx * inv_w * 0.5 + 0.5) * width
    sy = (0.5 - cy * inv_w * 0.5) * height
    x0 = jnp.min(jnp.where(front, sx, big), axis=1) - 1.0
    y0 = jnp.min(jnp.where(front, sy, big), axis=1) - 1.0
    x1 = jnp.max(jnp.where(front, sx, -big), axis=1) + 1.0
    y1 = jnp.max(jnp.where(front, sy, -big), axis=1) + 1.0
    any_front = jnp.any(front, axis=1)
    crossing = any_front & jnp.any(~front, axis=1)
    x0 = jnp.where(crossing, 0.0, x0)
    y0 = jnp.where(crossing, 0.0, y0)
    x1 = jnp.where(crossing, width - 1.0, x1)
    y1 = jnp.where(crossing, height - 1.0, y1)
    on = (x1 >= 0) & (y1 >= 0) & (x0 < width) & (y0 < height)
    dist = jnp.where(front, cw, big).min(axis=1)
    return (
        jnp.stack([x0, y0, x1, y1], axis=-1),
        inst_valid & on & any_front,
        dist,
    )


class WorkList(NamedTuple):
    """Flat supertile-major work items.

    meta rows: st, inst, first, last, base_id, item_valid, tile_y, tile_x,
    item zmin (fixed-point, for exact early-z skips).
    sub_rounds[c, w]: per-(item, cell) compaction round count
    ceil(count / K), where a cell is a (sub_h x win_w)-px block of the
    supertile (cell = subtile_row * n_win + x_window); 0 means the cell
    has no triangles from this item. Exact counts — the kernel loops
    exactly this many one-hot rounds, so no triangle is ever dropped by
    a range cap."""

    meta: jnp.ndarray        # (9, MAX_WORK) int32
    sub_rounds: jnp.ndarray  # (n_sub * n_win, MAX_WORK) int32
    num_items: jnp.ndarray   # () int32 (> MAX_WORK means overflow/drop)


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
    # 1px conservative pad, matching instance_bbox_components (the
    # production path) so both binnings agree exactly
    x0 = jnp.min(jnp.where(front, xy[..., 0], big), axis=1) - 1.0
    y0 = jnp.min(jnp.where(front, xy[..., 1], big), axis=1) - 1.0
    x1 = jnp.max(jnp.where(front, xy[..., 0], -big), axis=1) + 1.0
    y1 = jnp.max(jnp.where(front, xy[..., 1], -big), axis=1) + 1.0
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
    packed: PackedTris = None,  # from pack_tri_data — required
    sub_h: int = 8,
    compact_k: int = 32,
    win_w: int = 128,
    tile_h: int = 0,
) -> WorkList:
    """Supertile-major (st, instance) pairs, one leading dummy per
    supertile. With order_key (camera distance), instances are emitted
    near-to-far within each tile so early-z culls occluded items.

    sub_rounds[c, w] = ceil(#triangles of item w touching cell c / K)
    where cell c = subtile_row * (tile // win_w) + x_window: the exact
    number of K-wide compaction rounds the kernel runs per cell.

    ``tile_h`` (0 = square = ``tile``): supertile HEIGHT — rectangular
    supertiles (e.g. 128x256) halve the work-item count for wide
    instance footprints without growing VMEM past what a square tile of
    the larger side needs (the per-item fixed cost — DMA + in-kernel
    bf16 split + rank build — is ~3.5 us, the dominant non-eval term on
    round-heavy cameras; see docs/PERFORMANCE.md round 5)."""
    if packed is None:
        raise ValueError("packed (from pack_tri_data) is required")
    if tile_h == 0:
        tile_h = tile
    tiles_x = -(-width // tile)
    tiles_y = -(-height // tile_h)
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
    ty = (st // tiles_x).astype(jnp.float32) * tile_h
    ovl = (
        (bbox[:, 0][None, :] <= (tx + tile - 1)[:, None])
        & (bbox[:, 2][None, :] >= tx[:, None])
        & (bbox[:, 1][None, :] <= (ty + tile_h - 1)[:, None])
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

    inst_sel = jnp.maximum(w_inst, 0)
    tx0 = (w_st % tiles_x).astype(jnp.float32) * tile
    ty0 = (w_st // tiles_x).astype(jnp.float32) * tile_h

    # conservative per-(item, tile) nearest depth for early-z: an item
    # strictly behind every pixel of a fully covered tile can never
    # win (nor tie), so skipping it is exactly lossless. Stored as
    # floor-quantized fixed point (Mosaic cannot bitcast scalars);
    # the kernel ceil-quantizes its side, keeping the skip strict.
    bm = packed.batch_meta[inst_sel]              # (W, n_batch, 8)
    hit = (
        (bm[..., 0] <= tx0[:, None] + (tile - 1))
        & (bm[..., 2] >= tx0[:, None])
        & (bm[..., 1] <= ty0[:, None] + (tile_h - 1))
        & (bm[..., 3] >= ty0[:, None])
        & item_valid[:, None]
    )                                             # (W, n_batch)
    item_zmin = jnp.min(
        jnp.where(hit, bm[..., 4], jnp.float32(_FAR)), axis=1
    )
    item_zmin_q = jnp.floor(
        jnp.clip(item_zmin, 0.0, 2.0) * (1 << 20)
    ).astype(jnp.int32)

    # per-(item, subtile-row, x-window) triangle counts -> compaction
    # round counts. Computed once per INSTANCE as a batched MXU
    # contraction over lanes: counts_i[i, r, x] = sum_t yhit[i, r, t] *
    # xhit[i, x, t], with x at WINDOW granularity (win_w-px columns
    # inside each tile; win_w == tile degenerates to per-subtile-row
    # counts). The 0/1 factors are bf16-exact and the f32 accumulator is
    # exact to 2^24, so the counts are exact. Work items then pick their
    # (row-range, window-block) with one-hot f32 multiplies (also
    # exact). This replaces a per-work-item (max_work, n_sub, T)
    # compare/reduce sweep whose cost scaled with the work-list capacity
    # instead of the instance count.
    n_sub = tile_h // sub_h
    n_win = tile // win_w
    SR = tiles_y * n_sub
    XW = tiles_x * n_win
    cols = packed.tri_cols
    validt = cols[:, _C_VALID] > 0.0
    txs = jnp.arange(XW, dtype=jnp.float32)[None, :, None] * win_w
    xh = (
        (cols[:, _C_X0][:, None, :] <= txs + (win_w - 1))
        & (cols[:, _C_X1][:, None, :] >= txs)
        & validt[:, None, :]
    )                                              # (I, XW, T)
    srs = jnp.arange(SR, dtype=jnp.float32)[None, :, None] * sub_h
    yh = (
        (cols[:, _C_Y0][:, None, :] <= srs + (sub_h - 1))
        & (cols[:, _C_Y1][:, None, :] >= srs)
    )                                              # (I, SR, T)
    counts_i = jax.lax.dot_general(
        yh.astype(jnp.bfloat16), xh.astype(jnp.bfloat16),
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                              # (I, SR, XW)
    ci = counts_i[inst_sel].reshape(-1, SR, tiles_x, n_win)  # (W,SR,tx,nw)
    oh_tx = (
        jnp.arange(tiles_x, dtype=jnp.int32)[None, :]
        == (w_st % tiles_x)[:, None]
    )
    g = jnp.sum(
        jnp.where(oh_tx[:, None, :, None], ci, 0.0), axis=2
    )                                              # (W, SR, n_win)
    rows = (
        (w_st // tiles_x)[:, None] * n_sub
        + jnp.arange(n_sub, dtype=jnp.int32)[None, :]
    )                                              # (W, n_sub)
    oh_r = rows[:, :, None] == jnp.arange(SR, dtype=jnp.int32)[None, None, :]
    counts = jnp.sum(
        jnp.where(oh_r[..., None], g[:, None, :, :], 0.0), axis=2
    ).astype(jnp.int32)                            # (W, n_sub, n_win)
    rounds = jnp.where(
        item_valid[:, None, None], -(-counts // compact_k), 0
    ).astype(jnp.int32).reshape(-1, n_sub * n_win)

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
            item_zmin_q,
        ]
    )
    return WorkList(meta=meta, sub_rounds=rounds.T, num_items=count)


def _lane_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along the last (lane) axis via log2(n) shifted
    adds (Mosaic has no cumsum lowering; pltpu.roll is circular, so each
    step masks off the wrapped prefix)."""
    n = x.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    sh = 1
    while sh < n:
        shifted = pltpu.roll(x, sh, axis=x.ndim - 1)
        x = x + jnp.where(col >= sh, shifted, 0.0)
        sh *= 2
    return x


def _raster_kernel(
    meta_ref,     # scalar prefetch (9, MAX_WORK) int32
    subr_ref,     # scalar prefetch (n_cell, MAX_WORK) int32
    data_ref,     # (1, 48, T) f32 — one instance's packed tri data,
                  #   component-major (T on lanes)
    cols_ref,     # (1, 8, T) f32 — bbox/valid columns, lane-major
    *refs,        # full: z/id/attr outs + z/id/coef/ranks scratch;
                  # depth_only: z out + z/ranks scratch
                  # depth_only+with_id: z/id outs + z/id/ranks scratch
    tile: int,
    sub_h: int,
    compact_k: int,
    tris_per_inst: int,
    reverse_z: bool,
    wire_px: float,
    win_w: int,
    depth_only: bool = False,
    with_id: bool = False,
    tile_h: int = 0,
):
    if tile_h == 0:
        tile_h = tile
    if depth_only:
        if with_id:
            z_ref, id_ref, z_scr, id_scr, ranks = refs
            attr_ref = coef_acc = None
        else:
            z_ref, z_scr, ranks = refs
            id_ref = attr_ref = id_scr = coef_acc = None
    else:
        (z_ref, id_ref, attr_ref, z_scr, id_scr, coef_acc,
         ranks) = refs
    w = pl.program_id(0)
    first = meta_ref[2, w]
    last = meta_ref[3, w]
    base_id = meta_ref[4, w]
    ty = meta_ref[6, w]
    tx = meta_ref[7, w]

    n_sub = tile_h // sub_h
    n_win = tile // win_w
    n_cell = n_sub * n_win
    P = sub_h * win_w
    worst = -_FAR if reverse_z else _FAR
    K = compact_k
    T = tris_per_inst

    x0f = tx.astype(jnp.float32) * tile
    y0f = ty.astype(jnp.float32) * tile_h

    @pl.when(first == 1)
    def _init_tile():
        z_scr[:] = jnp.full((n_cell, P), worst, jnp.float32)
        if id_scr is not None:
            id_scr[:] = jnp.full((n_cell, P), _BIG_ID, jnp.int32)
        if coef_acc is not None:
            coef_acc[:] = jnp.zeros_like(coef_acc)

    kiota = jax.lax.broadcasted_iota(jnp.int32, (K, P), 0)

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
        zmin_q = meta_ref[8, w]
        z_edge = jnp.max(z_scr[:])
        edge_q = jnp.ceil(
            jnp.clip(z_edge, 0.0, 2.0) * (1 << 20)
        ).astype(jnp.int32)
        run_item = (item_valid_f == 1) & (zmin_q <= edge_q)

    @pl.when(run_item)
    def _run_item():
        # per-item prep: the 3-term bf16 split of the instance's tri data
        # (hoisting this host-side costs ~5 GB/frame of HBM traffic and
        # 50% more DMA per item; here it is a few VPU passes over VMEM).
        # depth_only pulls just the 19 eval channels (edges, z plane,
        # valid, ids(unused)+bbox block) — the compaction dots shrink
        # 48 -> 19 columns and the winner swap disappears entirely; each
        # retained output row is bit-identical to the full kernel's.
        if depth_only:
            deval = jnp.concatenate(
                [data_ref[0, _R_EDGE:_R_COEF, :],
                 data_ref[0, _R_VALID:_R_BBOX + 4, :]], axis=0
            )                                          # (19, T)
            r_valid = _R_COEF                          # 12
            r_bbox = _R_COEF + (_R_BBOX - _R_VALID)    # 15
        else:
            deval = data_ref[0]
            r_valid, r_bbox = _R_VALID, _R_BBOX
        d_hi, d_mid, d_lo = _split3_bf16(deval)        # (48|19, T) bf16

        # cell incidence masks -> compaction ranks. A cell is a
        # (sub_h x win_w)-px block of the supertile (win_w == tile
        # degenerates to the pure subtile-row layout): shrinking the
        # eval/update sweep from sub_h*tile to sub_h*win_w px per round
        # is the difference between sweeping the full 128-px tile width
        # for every ~16-px-wide triangle and sweeping only its window
        # (triangles straddling window boundaries join both windows).
        # tri bbox/valid live lane-major in cols_ref so the (n_cell, T)
        # masks, prefix sums, and (K, T) one-hots never transpose.
        cb = cols_ref[0]                              # (8, T)
        crow = jax.lax.broadcasted_iota(jnp.int32, (n_cell, T), 0)
        sy0v = y0f + (crow // n_win).astype(jnp.float32) * sub_h
        wx0v = x0f + (crow % n_win).astype(jnp.float32) * win_w
        m = (
            (cb[_C_Y0:_C_Y0 + 1, :] <= sy0v + (sub_h - 1))
            & (cb[_C_Y1:_C_Y1 + 1, :] >= sy0v)
            & (cb[_C_X0:_C_X0 + 1, :] <= wx0v + (win_w - 1))
            & (cb[_C_X1:_C_X1 + 1, :] >= wx0v)
            & (cb[_C_VALID:_C_VALID + 1, :] > 0.0)
        )                                             # (n_cell, T)
        mf = m.astype(jnp.float32)
        csum = _lane_cumsum(mf)
        ranks[:] = jnp.where(m, csum - 1.0, -1.0)

        def do_round(c, blk):
            """Eval + merge one compacted round against cell ``c``.
            blk (K, 48|19) f32 — identical math regardless of whether the
            compaction dot ran per round or batched (v12)."""
            sy0 = y0f + (c // n_win).astype(jnp.float32) * sub_h
            wx0 = x0f + (c % n_win).astype(jnp.float32) * win_w
            live = blk[:, r_valid:r_valid + 1] > 0.5

            # edge/z evaluation as VPU broadcast-FMA from the
            # compacted coefficient COLUMNS: (K, 1) x (1, P) lane
            # broadcasts are native after compaction (the round-1
            # kernel's slow path was per-tri VMEM scalar broadcasts,
            # which compaction eliminates). Exact f32 with the SAME
            # association as the oracle (a*px + b*py + c, left to
            # right, rasterize_tile_z) — bit-identical on CPU AND
            # hardware, unlike any MXU formulation.
            pcolf = jax.lax.broadcasted_iota(
                jnp.int32, (1, P), 1
            )
            pxc = (pcolf % win_w).astype(jnp.float32) + (wx0 + 0.5)
            pyc = (pcolf // win_w).astype(jnp.float32) + (sy0 + 0.5)

            def ev(base):
                return (
                    blk[:, base:base + 1] * pxc
                    + blk[:, base + 1:base + 2] * pyc
                    + blk[:, base + 2:base + 3]
                )  # (K, P)

            e0 = ev(_R_EDGE + 0)
            e1 = ev(_R_EDGE + 3)
            e2 = ev(_R_EDGE + 6)
            zq = ev(_R_Z)

            edge_min = jnp.minimum(e0, jnp.minimum(e1, e2))
            # 0 <= zq <= ~1 is the depth clip (near for clipless
            # crossing tris, far-with-slack for degenerate slivers;
            # matches ops/raster.py), plus the per-tri bbox scissor
            # (pixel index i covers iff bx0 <= i <= bx1)
            pxi = pxc - 0.5
            pyi = pyc - 0.5
            in_bb = (
                (pxi >= blk[:, r_bbox:r_bbox + 1])
                & (pxi <= blk[:, r_bbox + 2:r_bbox + 3])
                & (pyi >= blk[:, r_bbox + 1:r_bbox + 2])
                & (pyi <= blk[:, r_bbox + 3:r_bbox + 4])
            )
            cover = (
                (jnp.minimum(edge_min, zq) >= 0.0)
                & (zq <= 1.01) & live & in_bb
            )
            if wire_px > 0.0:
                cover = cover & (edge_min <= wire_px)
            zv = jnp.where(cover, zq, worst)

            if reverse_z:
                z_best = jnp.max(zv, axis=0, keepdims=True)
            else:
                z_best = jnp.min(zv, axis=0, keepdims=True)

            if depth_only and not with_id:
                # depth test only: no winner identity, no attribute
                # swap — just the running min/max merge (identical z
                # to the full kernel: ties write the same value)
                zs = z_scr[pl.ds(c, 1), :]
                if reverse_z:
                    z_scr[pl.ds(c, 1), :] = jnp.maximum(z_best, zs)
                else:
                    z_scr[pl.ds(c, 1), :] = jnp.minimum(z_best, zs)
                return 0

            if depth_only:
                # z + winner id (two-phase raster phase 1): the winner's
                # global id merges with the full kernel's EXACT
                # semantics (ties break to the lowest id), but the 30-row
                # coefficient swap is replaced by a single 2-row id dot
                # (both id channels are bf16-exact: id_hi is a multiple
                # of 256 <= 2047, id_lo < 256 — one bf16 MXU pass is
                # exact, no 3-term split needed).
                idx = jnp.min(
                    jnp.where(zv == z_best, kiota, K), axis=0,
                    keepdims=True,
                )  # (1, P)
                covered = idx < K
                ohw = (kiota == idx).astype(jnp.bfloat16)  # (K, P)
                wdims = (((0,), (0,)), ((), ()))
                r_id = r_valid + 1
                s_ids = blk[:, r_id:r_id + 2].astype(jnp.bfloat16)
                idv = jax.lax.dot_general(
                    s_ids, ohw, wdims,
                    preferred_element_type=jnp.float32,
                )                                           # (2, P)
                tid = (idv[0:1, :] + idv[1:2, :]).astype(jnp.int32)
                gid = jnp.where(covered, base_id + tid, _BIG_ID)
                zs = z_scr[pl.ds(c, 1), :]
                ids = id_scr[pl.ds(c, 1), :]
                if reverse_z:
                    better = z_best > zs
                else:
                    better = z_best < zs
                upd = covered & (
                    better | ((z_best == zs) & (gid < ids))
                )
                z_scr[pl.ds(c, 1), :] = jnp.where(upd, z_best, zs)
                id_scr[pl.ds(c, 1), :] = jnp.where(upd, gid, ids)
                return 0

            idx = jnp.min(
                jnp.where(zv == z_best, kiota, K), axis=0,
                keepdims=True,
            )  # (1, P)
            covered = idx < K

            # winner one-hot swap of rows [_R_COEF, _R_ID+2): the 27
            # interpolation coefficients AND the two id channels ride
            # the same ascending 3-term bf16 matmuls (ids are exact in
            # any case: id_hi is a multiple of 256 < 2048, id_lo <
            # 256). Three terms are REQUIRED for the coefficients:
            # tiny distant triangles have attr planes with huge
            # cancelling (a, b, c), so a 2-term 2^-16 relative-
            # of-coefficient error shows up as ~1e-3 on interpolated
            # values (measured 0.46% of pixels beyond the 3e-4
            # tolerance). Folding the ids in still saves the separate
            # id dot (~8 MXU passes per round).
            ohw = (kiota == idx).astype(jnp.bfloat16)  # (K, P)
            wdims = (((0,), (0,)), ((), ()))
            sw = blk[:, _R_COEF:_R_ID + 2]              # (K, 30)
            s_hi, s_mid, s_lo = _split3_bf16(sw)
            swapped = jax.lax.dot_general(
                s_lo, ohw, wdims,
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                s_mid, ohw, wdims,
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                s_hi, ohw, wdims,
                preferred_element_type=jnp.float32,
            )                                           # (30, P)
            new_coef = swapped[0:NUM_COEF]
            idv = swapped[NUM_COEF + 1:NUM_COEF + 3]
            tid = (idv[0:1, :] + idv[1:2, :]).astype(jnp.int32)
            gid = jnp.where(covered, base_id + tid, _BIG_ID)

            zs = z_scr[pl.ds(c, 1), :]
            ids = id_scr[pl.ds(c, 1), :]
            if reverse_z:
                better = z_best > zs
            else:
                better = z_best < zs
            upd = covered & (
                better | ((z_best == zs) & (gid < ids))
            )
            acc = coef_acc[pl.ds(c, 1), 0:NUM_COEF, :]
            coef_acc[pl.ds(c, 1), 0:NUM_COEF, :] = jnp.where(
                upd[None], new_coef[None], acc
            )
            z_scr[pl.ds(c, 1), :] = jnp.where(upd, z_best, zs)
            id_scr[pl.ds(c, 1), :] = jnp.where(upd, gid, ids)
            return 0
        # one one-hot compaction dot per round (kernel v11). A batched
        # variant (v12: chunks of 4 rounds sharing one 128-row dot at
        # full MXU row occupancy) measured WORSE in every configuration
        # and was removed from the production kernel —
        # docs/PERFORMANCE.md "Round 4: v12" keeps the experiment record.
        kiota_f = jax.lax.broadcasted_iota(
            jnp.int32, (K, T), 0
        ).astype(jnp.float32)                             # loop-invariant

        def cell_body(c, _):
            n_rounds = subr_ref[c, w]
            # Early-z stays ITEM-level only: a per-cell variant (the
            # same strict fixed-point skip against each cell's own
            # depth edge, one (1, P) reduce per (item, cell)) measured
            # 41.5 vs 43.9 FPS on the 1080p flythrough — the
            # always-paid reduce costs more than the skips save at
            # this workload's overdraw.
            run_cell = n_rounds > 0

            def round_body(r, _):
                # shift the RANK (one (1, T) subtract, exact: both
                # sides are integers < 2^24 in f32) instead of the
                # (K, T) slot iota — saves a full (K, T) VPU add per
                # round against the hoisted kiota_f. Bit-identical:
                # rank - r*K == kiota  <=>  rank == kiota + r*K.
                rank_s = (ranks[pl.ds(c, 1), :]
                          - (r * K).astype(jnp.float32))  # (1, T)
                oh = (rank_s == kiota_f).astype(jnp.bfloat16)  # (K, T)
                # NT contraction (both operands contract on lanes):
                # the component-major (48, T) layout needs no
                # transpose. Compaction partials per split term: each
                # dot is a single exact bf16 MXU pass (the one-hot is
                # 0/1), so each partial equals the compacted bf16
                # term exactly; ascending-term sum (lo, mid, hi).
                ntdims = (((1,), (1,)), ((), ()))
                p_lo = jax.lax.dot_general(
                    oh, d_lo, ntdims,
                    preferred_element_type=jnp.float32,
                )
                p_mid = jax.lax.dot_general(
                    oh, d_mid, ntdims,
                    preferred_element_type=jnp.float32,
                )
                p_hi = jax.lax.dot_general(
                    oh, d_hi, ntdims,
                    preferred_element_type=jnp.float32,
                )
                do_round(c, (p_lo + p_mid) + p_hi)
                return 0

            @pl.when(run_cell)
            def _run_rounds():
                jax.lax.fori_loop(0, n_rounds, round_body, 0)

            return 0

        jax.lax.fori_loop(0, n_cell, cell_body, 0)

    @pl.when(last == 1)
    def _finalize():
        # z/id: cell-major scratch -> row-major tile. With windows the
        # (sub_h, win_w) cell blocks are stitched back with lane-axis
        # concats (finalize runs once per tile — relayout cost is off the
        # hot loop). NOTE win_w < 128 does not lower on hardware (Mosaic
        # minor-dim-128 reshape rule; interpret-only).
        def stitch(src):
            rows = []
            for s in range(n_sub):
                rows.append(jnp.concatenate(
                    [src[s * n_win + wi:s * n_win + wi + 1, :]
                     .reshape(sub_h, win_w) for wi in range(n_win)],
                    axis=1,
                ))
            return jnp.concatenate(rows, axis=0)  # (tile_h, tile)

        if n_win == 1:
            z_ref[:] = z_scr[:].reshape(tile_h, tile)
        else:
            z_ref[:] = stitch(z_scr[:])
        if depth_only and not with_id:
            return
        idf_all = pltpu.bitcast(id_scr[:], jnp.float32)  # (n_cell, P)
        if n_win == 1:
            id_ref[:] = pltpu.bitcast(
                idf_all.reshape(tile_h, tile), jnp.int32
            )
        else:
            id_ref[:] = pltpu.bitcast(stitch(idf_all), jnp.int32)
        if depth_only:
            return
        dxl = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
        for s in range(n_sub):
            sy0 = y0f + s * sub_h
            py = (dxl // win_w).astype(jnp.float32) + 0.5 + sy0
            vparts = []
            for wi in range(n_win):
                px = (dxl % win_w).astype(jnp.float32) + (
                    0.5 + x0f + wi * win_w
                )
                coef = coef_acc[s * n_win + wi, 0:NUM_COEF, :]
                # SoA: a[9]; b[9]; c[9]
                vals = (
                    coef[0:9, :] * px + coef[9:18, :] * py
                    + coef[18:27, :]
                )                                     # (9, P)
                # perspective divide HERE (same guarded formula as the
                # XLA oracle): the output carries only the 8 resolved
                # attribute channels — 8 fewer (H, W) planes of HBM
                # write+read than shipping inv_w + attr-over-w out
                inv_w = vals[0:1, :]
                denom = jnp.where(jnp.abs(inv_w) > 1e-20, inv_w, 1.0)
                vparts.append(
                    (vals[1:9, :] / denom).reshape(8, sub_h, win_w)
                )
            out = (
                jnp.concatenate(vparts, axis=2) if n_win > 1
                else vparts[0].reshape(8, sub_h, tile)
            )
            attr_ref[:, s * sub_h:(s + 1) * sub_h, :] = out


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tile", "sub_h", "compact_k", "reverse_z",
        "max_work", "interpret", "wire_px", "win_w", "tile_h",
    ),
)
def rasterize_pallas(
    packed: PackedTris,
    work: WorkList,
    width: int,
    height: int,
    tile: int = 128,
    sub_h: int = 8,
    compact_k: int = 32,
    reverse_z: bool = False,
    max_work: int = 2048,
    interpret: bool = False,
    wire_px: float = 0.0,
    win_w: int = 128,
    tile_h: int = 0,
):
    """Returns (z (H, W), id (H, W) i32 [-1 = background], attrs (H, W, 8),
    None). H/W are padded to tile multiples then cropped. Attributes are
    perspective-divided at kernel finalize (the fourth slot kept for
    call-site compatibility). ``win_w`` must match the build_work_list
    call that made ``work``."""
    tri_data = packed.tri_data
    I, C, T = tri_data.shape
    assert C == _R_TOTAL
    if tile_h == 0:
        tile_h = tile
    n_cell = (tile_h // sub_h) * (tile // win_w)
    assert work.sub_rounds.shape[0] == n_cell, (
        f"work list built for {work.sub_rounds.shape[0]} cells, kernel "
        f"configured for {n_cell} (sub_h={sub_h}, win_w={win_w})"
    )
    # scalar-prefetch operands live in SMEM (~1 MB total on v5e)
    smem_bytes = (9 + n_cell) * max_work * 4
    assert smem_bytes < 900_000, (
        f"work-list scalars need {smem_bytes}B of ~1MB SMEM; reduce "
        f"max_work or increase sub_h/win_w"
    )
    pad_w = -(-width // tile) * tile
    pad_h = -(-height // tile_h) * tile_h
    P = sub_h * win_w

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(max_work,),
        in_specs=[
            pl.BlockSpec(
                (1, _R_TOTAL, T),
                lambda w, meta, sr: (meta[1, w], 0, 0),
            ),
            pl.BlockSpec(
                (1, _C_ROWS, T), lambda w, meta, sr: (meta[1, w], 0, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile_h, tile), lambda w, meta, sr: (meta[6, w], meta[7, w])
            ),
            pl.BlockSpec(
                (tile_h, tile), lambda w, meta, sr: (meta[6, w], meta[7, w])
            ),
            pl.BlockSpec(
                (8, tile_h, tile),
                lambda w, meta, sr: (0, meta[6, w], meta[7, w]),
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_cell, P), jnp.float32),
            pltpu.VMEM((n_cell, P), jnp.int32),
            pltpu.VMEM((n_cell, 32, P), jnp.float32),
            pltpu.VMEM((n_cell, T), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _raster_kernel,
        tile=tile,
        sub_h=sub_h,
        compact_k=compact_k,
        tris_per_inst=T,
        reverse_z=reverse_z,
        wire_px=wire_px,
        win_w=win_w,
        tile_h=tile_h,
    )
    z, idb, attr = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.int32),
            jax.ShapeDtypeStruct((8, pad_h, pad_w), jnp.float32),
        ],
        interpret=interpret,
    )(work.meta, work.sub_rounds, tri_data, packed.tri_cols)

    z = z[:height, :width]
    idb = idb[:height, :width]
    attr = attr[:, :height, :width]
    worst = -F32_FAR if reverse_z else F32_FAR
    background = z == worst
    idb = jnp.where(background, jnp.int32(-1), idb)
    # attrs are already perspective-divided at kernel finalize (the
    # fourth return slot is kept for call-site compatibility; no caller
    # consumed inv_w)
    attrs = jnp.moveaxis(attr, 0, -1)
    return z, idb, attrs, None


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tile", "sub_h", "compact_k", "reverse_z",
        "max_work", "interpret", "win_w", "tile_h",
    ),
)
def rasterize_pallas_depth(
    packed: PackedTris,
    work: WorkList,
    width: int,
    height: int,
    tile: int = 128,
    sub_h: int = 8,
    compact_k: int = 32,
    reverse_z: bool = False,
    max_work: int = 2048,
    interpret: bool = False,
    win_w: int = 128,
    tile_h: int = 0,
):
    """Depth-only variant of rasterize_pallas for light-view shadow
    rasters (the reference's depth-only TerrainPass run,
    Renderer.cpp:354-367 / TerrainPass.h:40 depthOnly PipelineKey bit):
    no winner identity, no attribute swap dots, no coefficient
    accumulator, and the compaction dots pull only the 19 eval channels
    — roughly half the full kernel's per-round work and none of its
    attribute output traffic. Returns z (H, W) f32 with background at
    F32_FAR; z is bit-identical to rasterize_pallas's z channel."""
    tri_data = packed.tri_data
    I, C, T = tri_data.shape
    assert C == _R_TOTAL
    if tile_h == 0:
        tile_h = tile
    n_cell = (tile_h // sub_h) * (tile // win_w)
    assert work.sub_rounds.shape[0] == n_cell
    smem_bytes = (9 + n_cell) * max_work * 4
    assert smem_bytes < 900_000
    pad_w = -(-width // tile) * tile
    pad_h = -(-height // tile_h) * tile_h
    P = sub_h * win_w

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(max_work,),
        in_specs=[
            pl.BlockSpec(
                (1, _R_TOTAL, T),
                lambda w, meta, sr: (meta[1, w], 0, 0),
            ),
            pl.BlockSpec(
                (1, _C_ROWS, T), lambda w, meta, sr: (meta[1, w], 0, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile_h, tile), lambda w, meta, sr: (meta[6, w], meta[7, w])
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_cell, P), jnp.float32),
            pltpu.VMEM((n_cell, T), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _raster_kernel,
        tile=tile,
        sub_h=sub_h,
        compact_k=compact_k,
        tris_per_inst=T,
        reverse_z=reverse_z,
        wire_px=0.0,
        win_w=win_w,
        depth_only=True,
        tile_h=tile_h,
    )
    z = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32),
        ],
        interpret=interpret,
    )(work.meta, work.sub_rounds, tri_data, packed.tri_cols)[0]
    return z[:height, :width]


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tile", "sub_h", "compact_k", "reverse_z",
        "max_work", "interpret", "win_w", "tile_h",
    ),
)
def rasterize_pallas_zid(
    packed: PackedTris,
    work: WorkList,
    width: int,
    height: int,
    tile: int = 128,
    sub_h: int = 8,
    compact_k: int = 32,
    reverse_z: bool = False,
    max_work: int = 2048,
    interpret: bool = False,
    win_w: int = 128,
    tile_h: int = 0,
):
    """Two-phase raster PHASE 1: z + winner-id raster (no attribute
    machinery). Like rasterize_pallas_depth but resolving the depth
    winner's GLOBAL triangle id with the full kernel's exact merge
    semantics (ties to the lowest id): the 30-row coefficient swap is
    replaced by a single bf16-exact 2-row id dot per round, and the
    coefficient accumulator (27 x P read-modify-write per round — the
    full kernel's largest per-round VMEM stream) disappears. z and id
    are bit-identical to rasterize_pallas's. Returns (z (pad_h, pad_w),
    id (pad_h, pad_w) i32 with _BIG_ID background) UNCROPPED — phase 2
    (rasterize_pallas_resolve) consumes the padded id image directly."""
    tri_data = packed.tri_data
    I, C, T = tri_data.shape
    assert C == _R_TOTAL
    if tile_h == 0:
        tile_h = tile
    n_cell = (tile_h // sub_h) * (tile // win_w)
    assert work.sub_rounds.shape[0] == n_cell
    smem_bytes = (9 + n_cell) * max_work * 4
    assert smem_bytes < 900_000
    pad_w = -(-width // tile) * tile
    pad_h = -(-height // tile_h) * tile_h
    P = sub_h * win_w

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(max_work,),
        in_specs=[
            pl.BlockSpec(
                (1, _R_TOTAL, T),
                lambda w, meta, sr: (meta[1, w], 0, 0),
            ),
            pl.BlockSpec(
                (1, _C_ROWS, T), lambda w, meta, sr: (meta[1, w], 0, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile_h, tile), lambda w, meta, sr: (meta[6, w], meta[7, w])
            ),
            pl.BlockSpec(
                (tile_h, tile), lambda w, meta, sr: (meta[6, w], meta[7, w])
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_cell, P), jnp.float32),
            pltpu.VMEM((n_cell, P), jnp.int32),
            pltpu.VMEM((n_cell, T), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _raster_kernel,
        tile=tile,
        sub_h=sub_h,
        compact_k=compact_k,
        tris_per_inst=T,
        reverse_z=reverse_z,
        wire_px=0.0,
        win_w=win_w,
        depth_only=True,
        with_id=True,
        tile_h=tile_h,
    )
    z, idb = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.int32),
        ],
        interpret=interpret,
    )(work.meta, work.sub_rounds, tri_data, packed.tri_cols)
    return z, idb


def filter_work_to_winners(
    work: WorkList,
    id_pad: jnp.ndarray,       # (pad_h, pad_w) i32 phase-1 winner ids
    tris_per_inst: int,
    width: int, height: int,
    tile: int = 128,
    sub_h: int = 16,
    win_w: int = 128,
    tile_h: int = 0,
) -> WorkList:
    """Two-phase raster: shrink the work list to (item, cell) pairs whose
    INSTANCE actually won a pixel of the cell in phase 1.

    Per cell, the set of winning instances is summarized by its [min,
    max] instance-id range (gather-free: a blocked reshape + min/max
    reduce over the cell's pixels) — a CONSERVATIVE EXACT filter: every
    winning instance lies inside its cell's range, so no resolve work is
    ever dropped; instances inside the range that didn't win just resolve
    to all-zero one-hots (cells are usually covered by 1-2 instances, so
    the range is tight). Round counts for surviving pairs are UNCHANGED
    (the filter is per-(item, cell), never per-triangle), so phase 2's
    ranks/one-hot machinery is identical to phase 1's.

    Mirrors the reference's fragment-shading-after-depth-test economics:
    the GPU's early-z hardware skips occluded fragment work
    (TerrainPass.cpp:222); here the ENTIRE attribute pipeline runs only
    where a triangle survived the depth test."""
    T = tris_per_inst
    if tile_h == 0:
        tile_h = tile
    tiles_x = -(-width // tile)
    n_sub = tile_h // sub_h
    n_win = tile // win_w
    SR = id_pad.shape[0] // sub_h
    XW = id_pad.shape[1] // win_w

    bg = id_pad == _BIG_ID
    inst = id_pad // T
    blk = inst.reshape(SR, sub_h, XW, win_w)
    bgb = bg.reshape(SR, sub_h, XW, win_w)
    mn = jnp.min(jnp.where(bgb, jnp.int32(2**30), blk), axis=(1, 3))
    mx = jnp.max(jnp.where(bgb, jnp.int32(-1), blk), axis=(1, 3))

    meta = work.meta
    W = meta.shape[1]
    w_st = meta[0]
    inst_w = meta[1]
    # per-item (n_sub, n_win) cell block of mn/mx, selected with one-hot
    # sums (no gathers in the frame path); mirrors build_work_list's
    # counts selection
    mn3 = mn.reshape(SR, tiles_x, n_win)
    mx3 = mx.reshape(SR, tiles_x, n_win)
    oh_tx = (
        jnp.arange(tiles_x, dtype=jnp.int32)[None, :]
        == (w_st % tiles_x)[:, None]
    )                                               # (W, tiles_x)
    mn_x = jnp.min(
        jnp.where(oh_tx[:, None, :, None], mn3[None], jnp.int32(2**30)),
        axis=2,
    )                                               # (W, SR, n_win)
    mx_x = jnp.max(
        jnp.where(oh_tx[:, None, :, None], mx3[None], jnp.int32(-1)),
        axis=2,
    )
    rows = (
        (w_st // tiles_x)[:, None] * n_sub
        + jnp.arange(n_sub, dtype=jnp.int32)[None, :]
    )                                               # (W, n_sub)
    oh_r = rows[:, :, None] == jnp.arange(SR, dtype=jnp.int32)[None, None, :]
    mn_c = jnp.min(
        jnp.where(oh_r[..., None], mn_x[:, None], jnp.int32(2**30)),
        axis=2,
    )                                               # (W, n_sub, n_win)
    mx_c = jnp.max(
        jnp.where(oh_r[..., None], mx_x[:, None], jnp.int32(-1)), axis=2
    )
    won = (
        (mn_c <= inst_w[:, None, None]) & (inst_w[:, None, None] <= mx_c)
    ).reshape(W, n_sub * n_win)
    rounds2 = jnp.where(won.T, work.sub_rounds, 0)   # (n_cell, W)
    item_live = (meta[5] == 1) & jnp.any(rounds2 > 0, axis=0)
    meta2 = meta.at[5].set(item_live.astype(jnp.int32))
    return WorkList(meta=meta2, sub_rounds=rounds2,
                    num_items=work.num_items)


def _resolve_kernel(
    meta_ref,     # scalar prefetch (9, MAX_WORK) int32
    subr_ref,     # scalar prefetch (n_cell, MAX_WORK) int32 — FILTERED
    data_ref,     # (1, 48, T) f32 — one instance's packed tri data
    cols_ref,     # (1, 8, T) f32 — bbox/valid columns
    win_ref,      # (tile, tile) i32 — phase-1 winner ids for this tile
    attr_ref,     # (8, tile, tile) f32 out
    coef_acc,     # (n_cell, 32, P) f32 scratch
    ranks,        # (n_cell, T) f32 scratch
    win_scr,      # (n_cell, P) i32 scratch — cell-major winner ids
    *,
    tile: int,
    sub_h: int,
    compact_k: int,
    tris_per_inst: int,
    win_w: int,
    tile_h: int = 0,
):
    """Two-phase raster PHASE 2: deferred attribute resolve.

    Per round, instead of evaluating edges/z over every pixel of the
    cell, the compacted triangles' GLOBAL ids are compared against the
    cell's phase-1 winner-id row — an exact one-hot with nonzeros only
    at pixels this round's triangles WON — and the winner's 27
    interpolation-plane coefficients accumulate through the same 3-term
    bf16 swap dots the single-phase kernel uses. Every pixel's winner
    appears in exactly one round of exactly one item (global ids are
    unique), so accumulation (+=) reproduces the single-phase where-swap
    EXACTLY: non-winner rounds contribute exact zeros. The eval sweep,
    cover chain, z state, and coefficient read-modify-select of the
    single-phase kernel are all gone; what remains per round is one
    (K, P) integer compare + 6 MXU dots + one accumulate."""
    w = pl.program_id(0)
    first = meta_ref[2, w]
    last = meta_ref[3, w]
    base_id = meta_ref[4, w]
    ty = meta_ref[6, w]
    tx = meta_ref[7, w]

    if tile_h == 0:
        tile_h = tile
    n_sub = tile_h // sub_h
    n_win = tile // win_w
    n_cell = n_sub * n_win
    P = sub_h * win_w
    K = compact_k
    T = tris_per_inst

    x0f = tx.astype(jnp.float32) * tile
    y0f = ty.astype(jnp.float32) * tile_h

    @pl.when(first == 1)
    def _init_tile():
        coef_acc[:] = jnp.zeros_like(coef_acc)
        # cell-major winner ids once per tile (an in-loop
        # slice+reshape variant measured the same — the resolve's cost
        # is the per-round (K, P) one-hot build + accumulate, not this
        # relayout; see docs/PERFORMANCE.md round 5). With x-windows the
        # flat reshape interleaves columns across cells, so each
        # (sub_h, win_w) block reshapes separately (static loop, once
        # per tile).
        if n_win == 1:
            win_scr[:] = win_ref[:].reshape(n_cell, P)
        else:
            for s_ in range(n_sub):
                for wi_ in range(n_win):
                    cc = s_ * n_win + wi_
                    win_scr[cc:cc + 1, :] = win_ref[
                        s_ * sub_h:(s_ + 1) * sub_h,
                        wi_ * win_w:(wi_ + 1) * win_w,
                    ].reshape(1, P)

    item_valid_f = meta_ref[5, w]

    @pl.when(item_valid_f == 1)
    def _run_item():
        # channels [12:42): 27 plane coefficients (SoA), valid, 2 ids —
        # a contiguous sublane slice of the SAME tri_data phase 1 read
        dres = data_ref[0, _R_COEF:_R_ID + 2, :]      # (30, T)
        d_hi, d_mid, d_lo = _split3_bf16(dres)
        c_valid = NUM_COEF                             # 27
        c_id = NUM_COEF + 1                            # 28

        # identical incidence masks/ranks as phase 1 (the filtered round
        # counts are either the full phase-1 count or 0, never partial,
        # so rank r*K+k indexes the same triangle group in both phases)
        cb = cols_ref[0]                              # (8, T)
        crow = jax.lax.broadcasted_iota(jnp.int32, (n_cell, T), 0)
        sy0v = y0f + (crow // n_win).astype(jnp.float32) * sub_h
        wx0v = x0f + (crow % n_win).astype(jnp.float32) * win_w
        m = (
            (cb[_C_Y0:_C_Y0 + 1, :] <= sy0v + (sub_h - 1))
            & (cb[_C_Y1:_C_Y1 + 1, :] >= sy0v)
            & (cb[_C_X0:_C_X0 + 1, :] <= wx0v + (win_w - 1))
            & (cb[_C_X1:_C_X1 + 1, :] >= wx0v)
            & (cb[_C_VALID:_C_VALID + 1, :] > 0.0)
        )                                             # (n_cell, T)
        mf = m.astype(jnp.float32)
        csum = _lane_cumsum(mf)
        ranks[:] = jnp.where(m, csum - 1.0, -1.0)

        kiota_f = jax.lax.broadcasted_iota(
            jnp.int32, (K, T), 0
        ).astype(jnp.float32)
        ntdims = (((1,), (1,)), ((), ()))
        wdims = (((0,), (0,)), ((), ()))

        def cell_body(c, _):
            n_rounds = subr_ref[c, w]

            def round_body(r, _):
                rank_s = (ranks[pl.ds(c, 1), :]
                          - (r * K).astype(jnp.float32))
                oh = (rank_s == kiota_f).astype(jnp.bfloat16)  # (K, T)
                p_lo = jax.lax.dot_general(
                    oh, d_lo, ntdims, preferred_element_type=jnp.float32)
                p_mid = jax.lax.dot_general(
                    oh, d_mid, ntdims, preferred_element_type=jnp.float32)
                p_hi = jax.lax.dot_general(
                    oh, d_hi, ntdims, preferred_element_type=jnp.float32)
                blk = (p_lo + p_mid) + p_hi                     # (K, 30)

                live = blk[:, c_valid:c_valid + 1] > 0.5        # (K, 1)
                gid = base_id + (
                    blk[:, c_id:c_id + 1] + blk[:, c_id + 1:c_id + 2]
                ).astype(jnp.int32)                             # (K, 1)
                win_row = win_scr[pl.ds(c, 1), :]               # (1, P)
                ohw = ((gid == win_row) & live).astype(jnp.bfloat16)

                s = blk[:, 0:NUM_COEF]                          # (K, 27)
                s_hi, s_mid, s_lo = _split3_bf16(s)
                swapped = jax.lax.dot_general(
                    s_lo, ohw, wdims, preferred_element_type=jnp.float32,
                ) + jax.lax.dot_general(
                    s_mid, ohw, wdims, preferred_element_type=jnp.float32,
                ) + jax.lax.dot_general(
                    s_hi, ohw, wdims, preferred_element_type=jnp.float32,
                )                                               # (27, P)
                acc = coef_acc[pl.ds(c, 1), 0:NUM_COEF, :]
                coef_acc[pl.ds(c, 1), 0:NUM_COEF, :] = (
                    acc + swapped[None]
                )
                return 0

            @pl.when(n_rounds > 0)
            def _run_rounds():
                jax.lax.fori_loop(0, n_rounds, round_body, 0)

            return 0

        jax.lax.fori_loop(0, n_cell, cell_body, 0)

    @pl.when(last == 1)
    def _finalize():
        # identical plane-eval finalize to the single-phase kernel
        # (same inputs -> bit-identical attrs)
        dxl = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
        for s in range(n_sub):
            sy0 = y0f + s * sub_h
            py = (dxl // win_w).astype(jnp.float32) + 0.5 + sy0
            vparts = []
            for wi in range(n_win):
                px = (dxl % win_w).astype(jnp.float32) + (
                    0.5 + x0f + wi * win_w
                )
                coef = coef_acc[s * n_win + wi, 0:NUM_COEF, :]
                vals = (
                    coef[0:9, :] * px + coef[9:18, :] * py
                    + coef[18:27, :]
                )                                     # (9, P)
                inv_w = vals[0:1, :]
                denom = jnp.where(jnp.abs(inv_w) > 1e-20, inv_w, 1.0)
                vparts.append(
                    (vals[1:9, :] / denom).reshape(8, sub_h, win_w)
                )
            out = (
                jnp.concatenate(vparts, axis=2) if n_win > 1
                else vparts[0].reshape(8, sub_h, tile)
            )
            attr_ref[:, s * sub_h:(s + 1) * sub_h, :] = out


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tile", "sub_h", "compact_k",
        "max_work", "interpret", "win_w", "tile_h",
    ),
)
def rasterize_pallas_resolve(
    packed: PackedTris,
    work: WorkList,            # filtered (filter_work_to_winners)
    id_pad: jnp.ndarray,       # (pad_h, pad_w) i32 phase-1 winner ids
    width: int,
    height: int,
    tile: int = 128,
    sub_h: int = 16,
    compact_k: int = 32,
    max_work: int = 2048,
    interpret: bool = False,
    win_w: int = 128,
    tile_h: int = 0,
):
    """Two-phase raster PHASE 2 wrapper: returns attrs (8, pad_h, pad_w)
    f32 (uncropped), bit-identical to rasterize_pallas's attribute
    planes given phase 1's winner ids."""
    tri_data = packed.tri_data
    I, C, T = tri_data.shape
    assert C == _R_TOTAL
    if tile_h == 0:
        tile_h = tile
    n_cell = (tile_h // sub_h) * (tile // win_w)
    assert work.sub_rounds.shape[0] == n_cell
    pad_w = -(-width // tile) * tile
    pad_h = -(-height // tile_h) * tile_h
    P = sub_h * win_w

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(max_work,),
        in_specs=[
            pl.BlockSpec(
                (1, _R_TOTAL, T),
                lambda w, meta, sr: (meta[1, w], 0, 0),
            ),
            pl.BlockSpec(
                (1, _C_ROWS, T), lambda w, meta, sr: (meta[1, w], 0, 0)
            ),
            pl.BlockSpec(
                (tile_h, tile), lambda w, meta, sr: (meta[6, w], meta[7, w])
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (8, tile_h, tile),
                lambda w, meta, sr: (0, meta[6, w], meta[7, w]),
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_cell, 32, P), jnp.float32),
            pltpu.VMEM((n_cell, T), jnp.float32),
            pltpu.VMEM((n_cell, P), jnp.int32),
        ],
    )

    kernel = functools.partial(
        _resolve_kernel,
        tile=tile,
        sub_h=sub_h,
        compact_k=compact_k,
        tris_per_inst=T,
        win_w=win_w,
        tile_h=tile_h,
    )
    attr = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, pad_h, pad_w), jnp.float32),
        ],
        interpret=interpret,
    )(work.meta, work.sub_rounds, tri_data, packed.tri_cols, id_pad)[0]
    return attr


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tile", "sub_h", "compact_k", "reverse_z",
        "max_work", "interpret", "win_w", "resolve_sub_h", "tile_h",
    ),
)
def rasterize_pallas_two_phase(
    packed: PackedTris,
    work: WorkList,
    width: int,
    height: int,
    tile: int = 128,
    sub_h: int = 16,
    compact_k: int = 32,
    reverse_z: bool = False,
    max_work: int = 2048,
    interpret: bool = False,
    win_w: int = 128,
    resolve_sub_h: int = 0,    # 0 = same as sub_h
    tile_h: int = 0,
):
    """Two-phase rasterization (VERDICT r4 next #1): phase 1 rasters
    z + winner id at depth-kernel cost (no swap dots, no coefficient
    accumulator), phase 2 resolves the 48 attribute channels ONLY for
    (item, cell) pairs whose instance won pixels — the TPU analog of
    fragment shading behind the GPU's early-z (TerrainPass.cpp:222).
    Output contract and bit-exactness match rasterize_pallas.
    ``resolve_sub_h`` must currently equal sub_h (the filtered work list
    reuses phase 1's cell geometry)."""
    del resolve_sub_h  # reserved: phase-2 cells re-derive from phase 1
    tri_data = packed.tri_data
    I, C, T = tri_data.shape
    z_pad, id_pad = rasterize_pallas_zid(
        packed, work, width, height, tile=tile, sub_h=sub_h,
        compact_k=compact_k, reverse_z=reverse_z, max_work=max_work,
        interpret=interpret, win_w=win_w, tile_h=tile_h,
    )
    work2 = filter_work_to_winners(
        work, id_pad, T, width, height, tile=tile, sub_h=sub_h,
        win_w=win_w, tile_h=tile_h,
    )
    attr = rasterize_pallas_resolve(
        packed, work2, id_pad, width, height, tile=tile, sub_h=sub_h,
        compact_k=compact_k, max_work=max_work, interpret=interpret,
        win_w=win_w, tile_h=tile_h,
    )
    z = z_pad[:height, :width]
    idb = id_pad[:height, :width]
    worst = -F32_FAR if reverse_z else F32_FAR
    background = z == worst
    idb = jnp.where(background, jnp.int32(-1), idb)
    attrs = jnp.moveaxis(attr[:, :height, :width], 0, -1)
    return z, idb, attrs, None
