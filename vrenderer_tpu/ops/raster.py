"""Software rasterizer: triangle setup + tile-based z-buffered raster.

The reference gets rasterization from GPU hardware behind a single
instanced drawIndexed (TerrainPass.cpp:215-222). On TPU this is the one
genuinely new component (SURVEY.md §2.5 item 3). The formulation is chosen
for TPU strengths, measured on v5e:

* NO scatter (0.15 G elem/s), NO per-pixel gather, NO global sort (2.8 ms
  for 1.5M keys). Instead, every (triangle-batch, pixel-tile) pair is
  evaluated densely: edge functions and interpolation planes are affine in
  pixel coordinates, so evaluating a batch of B triangles over a tile of P
  pixels is a [B, 3] @ [3, P] matmul (MXU) followed by coverage selects
  and a min/argmin merge over the batch axis (VPU). Depth resolution is a
  running (z, id) merge across batches — associative, deterministic
  (ties break to the lowest triangle id).
* Attributes are resolved in a second pass: once the visibility (z + id)
  buffer is final, a second sweep re-evaluates candidate batches and
  accumulates plane-interpolated attributes where the triangle id matches
  the winner (sum-of-masked, exact, no gather). Perspective correction
  interpolates attr/w and 1/w and divides at the end.

Triangle setup mirrors D3D conventions: pixel centers at (x+0.5, y+0.5),
y down in screen space, ndc z in [0, 1] interpolated linearly in screen
space (depth test LessOrEqual by default, GreaterOrEqual for reverse-z —
the reference's PipelineKey bits, TerrainPass.cpp:478-482). Backface
culling: clockwise front faces in screen space (D3D default with
frontCounterClockwise=false, TerrainPass.cpp:474, cull mode Back,
TerrainPass.cpp:211). Shared-edge pixels may pass coverage for both
triangles (no top-left tie rule; f32 edge functions make exact ties
benign: z and attributes agree on the shared edge — deviation from strict
D3D fill rules, documented).

Near-plane handling is clipless (Olano & Greer, "Triangle Scan Conversion
using 2D Homogeneous Coordinates"): triangles crossing w = 0 get their
edge and interpolation coefficients from the clip-space adjugate (no
division by w), which rasterizes exactly the visible w > 0 region —
the reference gets the same result from hardware clipping behind
TerrainPass.cpp:222, but clipless needs no fixed-shape geometry
expansion. A per-pixel z >= 0 coverage test supplies the near plane
itself (hardware clips 0 <= z <= w; the far test is left to LOD).
Fully in-front triangles keep the better-conditioned screen-space
setup; the two formulations agree to fp rounding on shared coverage.

This module is the portable XLA implementation (CPU-testable, and used
for the full frame on small configs). ops/raster_pallas.py provides the
TPU fast path with identical semantics, sharing the setup here.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vrenderer_tpu.utils import math3d

# numpy (not jnp) scalar: a module-level jnp constant allocates on the
# default device at IMPORT time (hangs the whole package import when the
# TPU tunnel is down) and would be captured into Pallas kernels as a
# traced constant (CLAUDE.md pitfall). np.float32 behaves identically in
# every jnp op.
F32_FAR = np.float32(3.0e38)


class TriSetup(NamedTuple):
    """Screen-space triangle setup, SoA over a flat triangle axis N.

    edge:  (N, 3, 3) — rows: 3 edges; cols: (a, b, c) with
           E(x, y) = a*x + b*y + c, E >= 0 inside for front faces.
    planes:(N, C, 3) — interpolation planes (a, b, c) for
           [z_ndc, inv_w, attr_0/w ... attr_{A-1}/w]; C = 2 + A.
    bbox:  (N, 4) — (x0, y0, x1, y1) inclusive pixel-tile clamp bounds.
    valid: (N,) bool.
    """

    edge: jnp.ndarray
    planes: jnp.ndarray
    bbox: jnp.ndarray
    valid: jnp.ndarray


class TriComponents(NamedTuple):
    """Component-form triangle setup: every field is a tuple of (I, T)
    maps with the triangle axis on lanes — never a stacked tensor with a
    tiny trailing axis (the TPU tile-padding trap; see module docstring
    and docs/PERFORMANCE.md). This is the producer layout the Pallas
    pack (raster_pallas.pack_components) consumes LINEARLY; TriSetup is
    assembled from it only for the XLA oracle path.

    edge:  9 maps — e{0,1,2} x (a, b, c), gradient-normalized.
    quant: 10 tuples of 3 maps — (a, b, c) planes for
           [z_ndc, inv_w, attr_0/w .. attr_7/w].
    bbox:  4 maps — x0, y0, x1, y1 (inclusive pixel bounds).
    valid: (I, T) bool.
    vert_clip: 4 maps of (I, V) — per-VERTEX clip components
           (x, y, z, w), for instance-level screen bounds.
    """

    edge: tuple
    quant: tuple
    bbox: tuple
    valid: jnp.ndarray
    vert_clip: tuple


def setup_components(
    world: jnp.ndarray,        # (I, V, 3) or (I, S, S, 3) world positions
    attrs: jnp.ndarray,        # (I, V, A) or (I, S, S, A)
    inst_valid: jnp.ndarray,   # (I,) bool
    tri_indices: jnp.ndarray,  # (T, 3) int32 into the V vertex axis
    world_to_clip: jnp.ndarray,  # (4, 4) row-vector
    width: int,
    height: int,
    w_eps: float = 1e-4,
) -> TriComponents:
    """Project vertices and build per-triangle setup for I*T triangles.

    Accepts either flat per-instance vertex arrays (general meshes) or the
    terrain's (S, S) lattice layout."""
    I = world.shape[0]
    A = attrs.shape[-1]
    verts = world.reshape(I, -1, 3)
    vattr = attrs.reshape(I, -1, A)

    # clip-space components as four (I, V) maps (a stacked (I, V, 4)
    # output keeps a 4-wide minor axis — padded TPU tiles; see the
    # component-form note below)
    M = world_to_clip
    vx, vy, vz = verts[..., 0], verts[..., 1], verts[..., 2]
    cc = [
        vx * M[0, c] + vy * M[1, c] + vz * M[2, c] + M[3, c]
        for c in range(4)
    ]  # 4 x (I, V)

    # Per-triangle per-vertex component pulls: vert(x, k) -> (I, T) values
    # of component map x at vertex k of every triangle. For the terrain
    # lattice this is pure shifted SLICES of the (S, S) grid (a jnp.take
    # here is an 80M-element gather per frame at 1080p — measured
    # ~0.15 G elem/s on v5e); general meshes use take (small counts).
    lattice_side = None
    if world.ndim == 4 and world.shape[1] == world.shape[2]:
        S = world.shape[1]
        T = tri_indices.shape[0]
        if T == (S - 1) * (S - 1) * 2:
            lattice_side = S

    if lattice_side is not None:
        S = lattice_side
        T = (S - 1) * (S - 1) * 2

        def vert(x, k):
            g = x.reshape(I, S, S)
            bl = g[:, :-1, :-1]
            tl = g[:, 1:, :-1]
            tr = g[:, 1:, 1:]
            br = g[:, :-1, 1:]
            # make_grid order: per cell (row-major), tri A = (bl, tl, tr),
            # tri B = (bl, tr, br) (TerrainPass.cpp:79-85)
            a = (bl, tl, tr)[k]
            b = (bl, tr, br)[k]
            return jnp.stack([a, b], axis=3).reshape(I, T)
    else:
        T = tri_indices.shape[0]

        def vert(x, k):
            return jnp.take(x, tri_indices[:, k], axis=1)

    # --- unified homogeneous 2D setup (clipless) -------------------------
    # With M rows (sx*w, sy*w, w) per vertex (linear in clip coords,
    # defined for ANY w, including behind the camera), every screen-affine
    # quantity q solves M @ coef = (q*w at verts), i.e. coef =
    # adj(M) @ v / det(M). Unnormalized barycentric planes are the
    # adjugate columns u_i = cross(vert_{i+1}, vert_{i+2}); inside the
    # VISIBLE (w > 0) part of the triangle, u_i/det >= 0 for all i, and
    # front facing is det < 0 under this module's orientation (for
    # in-front triangles det = w0*w1*w2 * area2 with area2 the y-down
    # signed pixel area — the reference mesh order lands CCW and is
    # drawn front-facing with back culling, TerrainPass.cpp:211,474-476,
    # so front = negative area = negative det). For in-front triangles
    # this formulation is algebraically identical to classic screen-space
    # barycentric setup; using it for every triangle halves the setup
    # tensor work (one path instead of standard + crossing).
    # COMPONENT FORM, not stacked (..., 3, 3) tensors: every array below
    # is (I, T) with the triangle axis on lanes. Stacked tiny-trailing-dim
    # tensors (cross products on (..., 3)) put 3x3 elements in a padded
    # (8, 128) TPU tile — measured 5x the whole-stage cost.
    w0, w1, w2 = vert(cc[3], 0), vert(cc[3], 1), vert(cc[3], 2)

    def vh(k):  # homogeneous screen row for vertex k: (Xh, Yh, w)
        w = (w0, w1, w2)[k]
        return (
            (vert(cc[0], k) + w) * (0.5 * width),
            (w - vert(cc[1], k)) * (0.5 * height),
            w,
        )

    a0, b0, c0 = vh(0)
    a1, b1, c1 = vh(1)
    a2, b2, c2 = vh(2)

    def cross3(ax, ay, az, bx, by, bz):
        return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)

    u0 = cross3(a1, b1, c1, a2, b2, c2)
    u1 = cross3(a2, b2, c2, a0, b0, c0)
    u2 = cross3(a0, b0, c0, a1, b1, c1)
    det = a0 * u0[0] + b0 * u0[1] + c0 * u0[2]     # (I, T)
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
    front = det < 0.0
    # edges negated so inside = all >= 0 (kept as 9 component maps)
    edge_maps = [
        -u0[0], -u0[1], -u0[2], -u1[0], -u1[1], -u1[2],
        -u2[0], -u2[1], -u2[2],
    ]

    # planes for [z_ndc, 1/w, attr/w]: q*w vertex values are
    # (z_clip, 1, attr); coef_j = sum_v u_v[j] * q_v * inv_det
    def plane(q0, q1, q2):  # three (I, T) vertex values -> 3 coef arrays
        return (
            (u0[0] * q0 + u1[0] * q1 + u2[0] * q2) * inv_det,
            (u0[1] * q0 + u1[1] * q1 + u2[1] * q2) * inv_det,
            (u0[2] * q0 + u1[2] * q1 + u2[2] * q2) * inv_det,
        )

    ones = jnp.ones_like(w0)
    quant = [plane(vert(cc[2], 0), vert(cc[2], 1), vert(cc[2], 2))]
    quant.append(plane(ones, ones, ones))
    for i in range(A):
        ai = vattr[..., i]
        quant.append(plane(vert(ai, 0), vert(ai, 1), vert(ai, 2)))

    # pixel bbox over IN-FRONT vertices (xy = (Xh/w, Yh/w) exactly equals
    # the viewport transform); crossing triangles get the full frame (the
    # w->0 locus projects to infinity)
    bh0, bh1, bh2 = w0 <= w_eps, w1 <= w_eps, w2 <= w_eps
    any_behind = bh0 | bh1 | bh2
    w_ok = ~any_behind
    crossing = any_behind & ~(bh0 & bh1 & bh2)
    xs0 = a0 / jnp.where(bh0, 1.0, w0)
    xs1 = a1 / jnp.where(bh1, 1.0, w1)
    xs2 = a2 / jnp.where(bh2, 1.0, w2)
    ys0 = b0 / jnp.where(bh0, 1.0, w0)
    ys1 = b1 / jnp.where(bh1, 1.0, w1)
    ys2 = b2 / jnp.where(bh2, 1.0, w2)
    # one pixel of padding: the bbox comes from per-vertex division while
    # coverage comes from the homogeneous edge functions, whose rounding
    # can differ by ~1e-4 px at the silhouette — the bbox must stay
    # conservative for the kernel's binning masks
    bx0 = jnp.clip(
        jnp.floor(jnp.minimum(xs0, jnp.minimum(xs1, xs2))) - 1,
        0, width - 1,
    )
    by0 = jnp.clip(
        jnp.floor(jnp.minimum(ys0, jnp.minimum(ys1, ys2))) - 1,
        0, height - 1,
    )
    bx1 = jnp.clip(
        jnp.ceil(jnp.maximum(xs0, jnp.maximum(xs1, xs2))) + 1,
        0, width - 1,
    )
    by1 = jnp.clip(
        jnp.ceil(jnp.maximum(ys0, jnp.maximum(ys1, ys2))) + 1,
        0, height - 1,
    )
    bbox_maps = (
        jnp.where(crossing, 0.0, bx0),
        jnp.where(crossing, 0.0, by0),
        jnp.where(crossing, width - 1.0, bx1),
        jnp.where(crossing, height - 1.0, by1),
    )
    on_screen = (bx1 >= bx0) & (by1 >= by0)

    # degeneracy guard: morph-collapsed lattice triangles have det ~ -eps
    # (det = w0*w1*w2*area2 shrinks with pixel area); a bare det < 0 lets
    # them through as half-plane-covering garbage after edge
    # normalization. For in-front triangles use the exact pixel-space
    # area test (y-down CCW front => area2 < -1e-12, the pre-homogeneous
    # behavior); crossing triangles keep the det sign (their pixel area
    # is undefined).
    area2 = (xs1 - xs0) * (ys2 - ys0) - (xs2 - xs0) * (ys1 - ys0)
    front = jnp.where(crossing, front, area2 < -1e-12)

    finite = jnp.isfinite(det)
    for q in quant:
        for m in q:
            finite = finite & jnp.isfinite(m)
    for u in (u0, u1, u2):
        for c in range(3):
            finite = finite & jnp.isfinite(u[c])
    valid = (
        front & finite & inst_valid[:, None]
        & (crossing | (w_ok & on_screen))
    )

    # normalize each edge by its gradient magnitude: E becomes the signed
    # pixel distance to the edge (sign/coverage unchanged; enables the
    # wireframe fill mode, reference RasterFillMode::Wireframe,
    # TerrainPass.cpp:311)
    norm_edges = []
    for e in range(3):
        ea, eb, ec = edge_maps[3 * e:3 * e + 3]
        g = jnp.maximum(jnp.sqrt(ea * ea + eb * eb), 1e-20)
        norm_edges += [ea / g, eb / g, ec / g]

    return TriComponents(
        edge=tuple(norm_edges),
        quant=tuple(tuple(q) for q in quant),
        bbox=bbox_maps,
        valid=valid,
        vert_clip=tuple(cc),
    )


def setup_triangles(
    world: jnp.ndarray,
    attrs: jnp.ndarray,
    inst_valid: jnp.ndarray,
    tri_indices: jnp.ndarray,
    world_to_clip: jnp.ndarray,
    width: int,
    height: int,
    w_eps: float = 1e-4,
) -> TriSetup:
    """Stacked-tensor setup for the XLA oracle rasterizer (and tests).

    The Pallas fast path must NOT go through this: the (N, 3, 3) /
    (N, C, 3) stacked layouts exist for rasterize_xla's batch indexing and
    cost real HBM traffic to materialize; the fast path consumes
    TriComponents directly via raster_pallas.pack_components."""
    comp = setup_components(
        world, attrs, inst_valid, tri_indices, world_to_clip,
        width, height, w_eps,
    )
    I, T = comp.valid.shape
    edges = jnp.stack(comp.edge, axis=-1).reshape(I, T, 3, 3)
    coef_list = [m for q in comp.quant for m in q]
    planes = jnp.stack(coef_list, axis=-1).reshape(I, T, len(comp.quant), 3)
    bbox = jnp.stack(comp.bbox, axis=-1)
    return TriSetup(
        edge=edges.reshape(I * T, 3, 3),
        planes=planes.reshape(I * T, len(comp.quant), 3),
        bbox=bbox.reshape(I * T, 4),
        valid=comp.valid.reshape(I * T),
    )


def shift_setup_y(setup: TriSetup, y0) -> TriSetup:
    """Rebase stacked-setup screen coefficients to a band at global row
    y0 (the XLA-oracle analog of shift_components_y): every affine
    E(x, y) = a x + b y + c becomes E'(x, y') = a x + b y' + (c + b y0)
    in the band's local frame; bbox y shifts by -y0."""
    edge = setup.edge.at[..., 2].add(setup.edge[..., 1] * y0)
    planes = setup.planes.at[..., 2].add(setup.planes[..., 1] * y0)
    bbox = setup.bbox.at[..., 1].add(-y0)
    bbox = bbox.at[..., 3].add(-y0)
    return TriSetup(edge=edge, planes=planes, bbox=bbox, valid=setup.valid)


def shift_components_y(comp: TriComponents, y0) -> TriComponents:
    """Rebase component-form screen coefficients to a band at global row
    y0: E(x, y_local) = a x + b y_local + (c + b y0); bbox y shifts by
    -y0. The sharded screen-band path's analog of
    parallel.sharded.shift_setup_y. vert_clip is untouched (instance
    bounds are computed before shifting)."""
    e = list(comp.edge)
    for k in range(3):
        e[3 * k + 2] = e[3 * k + 2] + e[3 * k + 1] * y0
    quant = tuple(
        (a, b, c + b * y0) for (a, b, c) in comp.quant
    )
    bbox = (comp.bbox[0], comp.bbox[1] - y0, comp.bbox[2], comp.bbox[3] - y0)
    return TriComponents(
        edge=tuple(e), quant=quant, bbox=bbox, valid=comp.valid,
        vert_clip=comp.vert_clip,
    )


def _pixel_matrix(x0, y0, th: int, tw: int, dtype=jnp.float32):
    """(3, th*tw) rows = (x+0.5, y+0.5, 1) for the tile at (x0, y0)."""
    ys = jnp.arange(th, dtype=dtype) + 0.5
    xs = jnp.arange(tw, dtype=dtype) + 0.5
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    px = (xx + x0).reshape(-1)
    py = (yy + y0).reshape(-1)
    return jnp.stack([px, py, jnp.ones_like(px)], axis=0)


def rasterize_tile_z(
    edge: jnp.ndarray,     # (B, 3, 3)
    zplane: jnp.ndarray,   # (B, 3)
    tri_id: jnp.ndarray,   # (B,) global ids (int32); invalid = -1
    pix: jnp.ndarray,      # (3, P) pixel matrix
    z_init: jnp.ndarray,   # (P,)
    id_init: jnp.ndarray,  # (P,)
    reverse_z: bool = False,
    wire_px: float = 0.0,  # > 0: wireframe fill mode, line half-width
    bbox: jnp.ndarray | None = None,  # (B, 4) per-tri scissor (incl. px idx)
):
    """Merge one triangle batch into a tile's (z, id) buffers.

    Pure function of arrays. Affine evaluation uses the same broadcast-FMA
    association as the Pallas kernel (a*x + b*y + c, left to right) so the
    two paths are bit-identical.
    """
    def affine(coef):  # coef (..., 3) -> (..., P)
        return (
            coef[..., 0:1] * pix[0][None]
            + coef[..., 1:2] * pix[1][None]
            + coef[..., 2:3]
        )

    ev = affine(edge.reshape(-1, 3)).reshape(edge.shape[0], 3, -1)  # (B,3,P)
    cover = jnp.all(ev >= 0.0, axis=1)                  # (B, P)
    if wire_px > 0.0:
        cover = cover & (jnp.min(ev, axis=1) <= wire_px)
    zv = affine(zplane)                                 # (B, P)
    # depth clip: hardware clips 0 <= z <= w, i.e. z01 in [0, 1]. The
    # near side is required for the clipless crossing-triangle path; the
    # far side rejects degenerate slivers whose z plane blows up
    # (tiny-determinant setups can pass the edge test at a stray pixel
    # with a wild depth). Slack on the far side: distant horizon pixels
    # sit at z01 ~ 0.9999 and the plane-eval rounding (~4e-3 rel on
    # hardware) must not clip them; sliver garbage is at z >> 1.
    cover = cover & (zv >= 0.0) & (zv <= 1.01)
    if bbox is not None:
        # per-triangle scissor: near-parallel sliver edges can round to
        # >= 0 at pixels far outside the triangle (both here and in the
        # kernel); the bbox bounds coverage exactly. Pixel index i covers
        # iff bx0 <= i <= bx1, with centers at i + 0.5.
        cover = cover & (
            (pix[0][None] >= bbox[:, 0:1] + 0.5)
            & (pix[0][None] <= bbox[:, 2:3] + 0.5)
            & (pix[1][None] >= bbox[:, 1:2] + 0.5)
            & (pix[1][None] <= bbox[:, 3:4] + 0.5)
        )
    live = cover & (tri_id >= 0)[:, None]
    worst = -F32_FAR if reverse_z else F32_FAR
    zv = jnp.where(live, zv, worst)

    better = (zv > z_init[None, :]) if reverse_z else (zv < z_init[None, :])
    # lowest-id deterministic tie-break within the batch via argmin/argmax
    if reverse_z:
        best = jnp.argmax(zv, axis=0)
    else:
        best = jnp.argmin(zv, axis=0)
    z_batch = jnp.take_along_axis(zv, best[None, :], axis=0)[0]
    id_batch = tri_id[best]
    upd = (z_batch < z_init) if not reverse_z else (z_batch > z_init)
    # exact tie across batches: keep lower id
    tie = (z_batch == z_init) & (id_batch < id_init) & (id_batch >= 0)
    upd = upd | tie
    z_out = jnp.where(upd, z_batch, z_init)
    id_out = jnp.where(upd, id_batch, id_init)
    return z_out, id_out


def resolve_tile_attrs(
    planes: jnp.ndarray,   # (B, C, 3) [z, inv_w, attr/w...]
    tri_id: jnp.ndarray,   # (B,)
    pix: jnp.ndarray,      # (3, P)
    id_buf: jnp.ndarray,   # (P,) winning ids
    acc: jnp.ndarray,      # (C-1, P) accumulator [inv_w, attr/w...]
):
    """Accumulate interpolated attributes where tri_id matches the winner."""
    prec = jax.lax.Precision.HIGHEST
    B, C, _ = planes.shape
    vals = jax.lax.dot_general(
        planes[:, 1:, :].reshape(-1, 3), pix, (((1,), (0,)), ((), ())),
        precision=prec,
    ).reshape(B, C - 1, -1)                              # (B, C-1, P)
    mask = (tri_id[:, None] == id_buf[None, :]) & (tri_id >= 0)[:, None]
    return acc + jnp.sum(jnp.where(mask[:, None, :], vals, 0.0), axis=0)


@partial(jax.jit, static_argnames=("width", "height", "tile", "batch",
                                   "reverse_z", "num_attrs", "wire_px"))
def rasterize_xla(
    setup: TriSetup,
    width: int,
    height: int,
    tile: tuple = (8, 128),
    batch: int = 128,
    reverse_z: bool = False,
    num_attrs: int = 8,
    wire_px: float = 0.0,
):
    """Brute-force reference rasterizer: every tile tests every triangle
    batch (no binning). O(tiles * triangles) — for tests and small frames;
    the binned Pallas path is the performance implementation.

    Returns (z (H, W), id (H, W) int32, attrs (H, W, A)).
    """
    th, tw = tile
    assert width % tw == 0 and height % th == 0
    n = setup.edge.shape[0]
    nb = (n + batch - 1) // batch
    pad = nb * batch - n

    def pad0(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    edge = pad0(setup.edge).reshape(nb, batch, 3, 3)
    planes = pad0(setup.planes).reshape(nb, batch, -1, 3)
    bboxes = pad0(setup.bbox).reshape(nb, batch, 4)
    ids = jnp.where(setup.valid, jnp.arange(n, dtype=jnp.int32), -1)
    ids = jnp.pad(ids, (0, pad), constant_values=-1).reshape(nb, batch)

    tiles_y = height // th
    tiles_x = width // tw
    worst = -F32_FAR if reverse_z else F32_FAR

    def do_tile(t_idx):
        ty = t_idx // tiles_x
        tx = t_idx % tiles_x
        pix = _pixel_matrix(
            (tx * tw).astype(jnp.float32), (ty * th).astype(jnp.float32), th, tw
        )
        z0 = jnp.full((th * tw,), worst, jnp.float32)
        i0 = jnp.full((th * tw,), jnp.int32(2**31 - 1))

        def zbody(b, carry):
            z, i = carry
            return rasterize_tile_z(
                edge[b], planes[b, :, 0, :], ids[b], pix, z, i, reverse_z,
                wire_px, bboxes[b],
            )

        z, idb = jax.lax.fori_loop(0, nb, zbody, (z0, i0))
        idb = jnp.where(
            (z == worst), jnp.int32(-1), idb
        )

        acc0 = jnp.zeros((planes.shape[2] - 1, th * tw), jnp.float32)

        def abody(b, acc):
            return resolve_tile_attrs(planes[b], ids[b], pix, idb, acc)

        acc = jax.lax.fori_loop(0, nb, abody, acc0)
        inv_w = acc[0]
        attrs = acc[1:] / jnp.where(jnp.abs(inv_w) > 1e-20, inv_w, 1.0)
        return z.reshape(th, tw), idb.reshape(th, tw), attrs.reshape(-1, th, tw)

    t_ids = jnp.arange(tiles_y * tiles_x)
    z, idb, attrs = jax.lax.map(do_tile, t_ids)
    z = z.reshape(tiles_y, tiles_x, th, tw).swapaxes(1, 2).reshape(height, width)
    idb = idb.reshape(tiles_y, tiles_x, th, tw).swapaxes(1, 2).reshape(height, width)
    A = attrs.shape[1]
    attrs = (
        attrs.reshape(tiles_y, tiles_x, A, th, tw)
        .transpose(2, 0, 3, 1, 4)
        .reshape(A, height, width)
    )
    return z, idb, jnp.moveaxis(attrs, 0, -1)
