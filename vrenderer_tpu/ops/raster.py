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

from vrenderer_tpu.utils import math3d

F32_FAR = jnp.float32(3.0e38)


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


def setup_triangles(
    world: jnp.ndarray,        # (I, V, 3) or (I, S, S, 3) world positions
    attrs: jnp.ndarray,        # (I, V, A) or (I, S, S, A)
    inst_valid: jnp.ndarray,   # (I,) bool
    tri_indices: jnp.ndarray,  # (T, 3) int32 into the V vertex axis
    world_to_clip: jnp.ndarray,  # (4, 4) row-vector
    width: int,
    height: int,
    w_eps: float = 1e-4,
) -> TriSetup:
    """Project vertices and build per-triangle setup for I*T triangles.

    Accepts either flat per-instance vertex arrays (general meshes) or the
    terrain's (S, S) lattice layout."""
    I = world.shape[0]
    A = attrs.shape[-1]
    verts = world.reshape(I, -1, 3)
    vattr = attrs.reshape(I, -1, A)

    clip = math3d.transform_points_h(world_to_clip, verts)  # (I, V, 4)
    xy, z_ndc, inv_w = math3d.clip_to_screen(clip, width, height)

    # Per-triangle vertex pulls. For the terrain lattice layout this is
    # done with pure shifted SLICES of the (S, S) grid (a jnp.take here is
    # an 80M-element gather per frame at 1080p — measured ~0.15G elem/s on
    # v5e); general meshes use take (small vertex counts).
    lattice_side = None
    if world.ndim == 4 and world.shape[1] == world.shape[2]:
        S = world.shape[1]
        T = tri_indices.shape[0]
        if T == (S - 1) * (S - 1) * 2:
            lattice_side = S

    if lattice_side is not None:
        S = lattice_side

        def tri_take(x):
            g = x.reshape((I, S, S) + x.shape[2:])
            bl = g[:, :-1, :-1]
            tl = g[:, 1:, :-1]
            tr = g[:, 1:, 1:]
            br = g[:, :-1, 1:]
            # make_grid order: per cell (row-major), tri A = (bl, tl, tr),
            # tri B = (bl, tr, br) (TerrainPass.cpp:79-85)
            a = jnp.stack([bl, tl, tr], axis=3)   # (I, S-1, S-1, 3, ...)
            b = jnp.stack([bl, tr, br], axis=3)
            both = jnp.stack([a, b], axis=3)      # (I, S-1, S-1, 2, 3, ...)
            return both.reshape(
                (I, (S - 1) * (S - 1) * 2, 3) + x.shape[2:]
            )
    else:
        def tri_take(x):
            return jnp.take(x, tri_indices.reshape(-1), axis=1).reshape(
                (I, tri_indices.shape[0], 3) + x.shape[2:]
            )

    pxy = tri_take(xy)          # (I, T, 3, 2)
    pz = tri_take(z_ndc)        # (I, T, 3)
    piw = tri_take(inv_w)       # (I, T, 3)
    pw = tri_take(clip[..., 3])  # (I, T, 3)
    pa = tri_take(vattr)        # (I, T, 3, A)

    x0, y0 = pxy[..., 0, 0], pxy[..., 0, 1]
    x1, y1 = pxy[..., 1, 0], pxy[..., 1, 1]
    x2, y2 = pxy[..., 2, 0], pxy[..., 2, 1]

    # signed area*2 in y-down pixel space. The reference mesh order
    # (bl, tl, tr / bl, tr, br; TerrainPass.cpp:79-85) lands
    # counter-clockwise here under the shared view conventions, and the
    # reference renders it front-facing with back culling
    # (TerrainPass.cpp:211,474-476) — so front faces are area2 < 0.
    area2 = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    front = area2 < -1e-12

    # edges: E_i opposite vertex i; negated so inside = all E >= 0 for
    # front (negative-area) faces
    def edge(ax, ay, bx, by):
        # -area2 * lambda_i for edge a->b (opposite vertex i)
        return jnp.stack([by - ay, ax - bx, bx * ay - by * ax], axis=-1)

    e0 = edge(x1, y1, x2, y2)
    e1 = edge(x2, y2, x0, y0)
    e2 = edge(x0, y0, x1, y1)
    edges = jnp.stack([e0, e1, e2], axis=-2)  # (I, T, 3, 3)

    # lambda_i = E_i / (-area2); the negations cancel in the plane math
    inv_area = 1.0 / jnp.where(jnp.abs(area2) > 1e-12, -area2, 1.0)

    # interpolation planes from barycentric identity:
    # q(x,y) = sum_i q_i * E_i(x,y) * inv_area  -> affine in (x, y)
    def plane(q):  # q: (I, T, 3) values at vertices
        coef = jnp.einsum("...i,...ij->...j", q * inv_area[..., None], edges)
        return coef  # (I, T, 3) = (a, b, c)

    quantities = [pz, piw] + [pa[..., i] * piw for i in range(A)]
    planes = jnp.stack([plane(q) for q in quantities], axis=-2)  # (I,T,C,3)

    # pixel-space bbox, clamped to the viewport
    xs = pxy[..., 0]
    ys = pxy[..., 1]
    bx0 = jnp.clip(jnp.floor(jnp.min(xs, axis=-1)), 0, width - 1)
    by0 = jnp.clip(jnp.floor(jnp.min(ys, axis=-1)), 0, height - 1)
    bx1 = jnp.clip(jnp.ceil(jnp.max(xs, axis=-1)), 0, width - 1)
    by1 = jnp.clip(jnp.ceil(jnp.max(ys, axis=-1)), 0, height - 1)
    bbox = jnp.stack([bx0, by0, bx1, by1], axis=-1)

    on_screen = (bx1 >= bx0) & (by1 >= by0)
    w_ok = jnp.all(pw > w_eps, axis=-1)
    valid = front & w_ok & on_screen & inst_valid[:, None]

    # --- clipless near-plane path for w-crossing triangles ---------------
    # Homogeneous 2D formulation: with M rows (sx*w, sy*w, w) per vertex
    # (linear in clip coords, defined for any w), every screen-affine
    # quantity q solves M @ coef = (q*w at verts), i.e. coef =
    # adj(M) @ v / det(M). Unnormalized barycentric planes are the
    # adjugate columns u_i = cross(vert_{i+1}, vert_{i+2}); inside the
    # VISIBLE (w > 0) part of the triangle, u_i/det >= 0 for all i, and
    # front facing is det < 0 under this module's orientation (for
    # in-front triangles det = w0*w1*w2 * area2, matching area2 < 0).
    pc = tri_take(clip)                           # (I, T, 3, 4)
    Xh = (pc[..., 0] + pc[..., 3]) * (0.5 * width)
    Yh = (pc[..., 3] - pc[..., 1]) * (0.5 * height)
    Vh = jnp.stack([Xh, Yh, pc[..., 3]], axis=-1)  # (I, T, 3, 3)
    u0 = jnp.cross(Vh[..., 1, :], Vh[..., 2, :])
    u1 = jnp.cross(Vh[..., 2, :], Vh[..., 0, :])
    u2 = jnp.cross(Vh[..., 0, :], Vh[..., 1, :])
    det = jnp.sum(Vh[..., 0, :] * u0, axis=-1)     # (I, T)
    h_edges = -jnp.stack([u0, u1, u2], axis=-2)    # inside = all >= 0
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1.0)

    def h_plane(v):  # v: q*w values at verts (zc for z_ndc, 1 for 1/w, a)
        return (
            u0 * v[..., 0:1] + u1 * v[..., 1:2] + u2 * v[..., 2:3]
        ) * inv_det[..., None]

    h_quants = [pc[..., 2], jnp.ones_like(pw)] + [
        pa[..., i] for i in range(A)
    ]
    h_planes = jnp.stack([h_plane(q) for q in h_quants], axis=-2)

    behind = pw <= w_eps
    crossing = jnp.any(behind, axis=-1) & jnp.any(~behind, axis=-1)
    h_front = det < 0.0
    full_bbox = jnp.asarray(
        [0.0, 0.0, width - 1.0, height - 1.0], jnp.float32
    )
    h_ok = (
        crossing & h_front & inst_valid[:, None]
        & jnp.all(jnp.isfinite(h_planes), axis=(-2, -1))
        & jnp.all(jnp.isfinite(h_edges), axis=(-2, -1))
    )

    edges = jnp.where(crossing[..., None, None], h_edges, edges)
    planes = jnp.where(crossing[..., None, None], h_planes, planes)
    # the visible part of a crossing triangle can span the whole screen
    # (its w->0 locus projects to infinity): conservative full-frame bbox
    bbox = jnp.where(crossing[..., None], full_bbox, bbox)
    valid = jnp.where(crossing, h_ok, valid)

    # normalize each edge by its gradient magnitude: E becomes the signed
    # pixel distance to the edge (sign/coverage unchanged; enables the
    # wireframe fill mode, reference RasterFillMode::Wireframe,
    # TerrainPass.cpp:311)
    grad = jnp.sqrt(
        edges[..., 0] ** 2 + edges[..., 1] ** 2
    )
    edges = edges / jnp.maximum(grad, 1e-20)[..., None]

    T = tri_indices.shape[0]
    return TriSetup(
        edge=edges.reshape(I * T, 3, 3),
        planes=planes.reshape(I * T, planes.shape[-2], 3),
        bbox=bbox.reshape(I * T, 4),
        valid=valid.reshape(I * T),
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
                wire_px,
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
