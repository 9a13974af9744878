"""3D math with the reference's conventions, as pure JAX.

Conventions (matching the reference's donut::math + HLSL usage):

* **Row vectors**: points transform as ``v' = v @ M``. The reference's
  shaders declare ``#pragma pack_matrix(row_major)`` and transform with
  ``mul(vector, matrix)`` (terrain_vs.hlsl:1,60-61); donut's math library
  composes affines the same way (``scale * translation`` applies scale
  first, TerrainPass.cpp:245-249).
* **Affine transforms** are stored 4x3-like: a 3x3 linear part with a
  translation row appended -> (4, 3). ``affine_to_3x4`` packs the
  per-instance layout the reference streams to the VS
  (InstanceData.transform, a float3x4; terrain_vs.hlsl:37,44).
* **Projection** is D3D-style: clip z in [0, 1], y up
  (math::perspProjD3DStyle, Renderer.cpp:315). Right-handed view space,
  camera looking down -Z.
* **Frustum** planes are extracted from the row-vector view-projection
  matrix; ``frustum_intersects_box`` reproduces
  dm::frustum::intersectsWith semantics (used at QuadTree.cpp:99).

Everything here is shape-polymorphic over leading batch dims and jittable.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# Small 4x4-class transforms need full f32 precision; TPU matmuls default
# to bf16 inputs otherwise. The big rasterizer/resampling matmuls pick
# their own precision explicitly.
_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# Vectors
# ---------------------------------------------------------------------------

def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-20) -> jnp.ndarray:
    return v / jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=True) + eps)


def length(v: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(v * v, axis=axis))


def dot(a: jnp.ndarray, b: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return jnp.sum(a * b, axis=axis)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def saturate(x: jnp.ndarray) -> jnp.ndarray:
    """HLSL saturate: clamp to [0, 1] (terrain_vs.hlsl:24)."""
    return jnp.clip(x, 0.0, 1.0)


def frac(x: jnp.ndarray) -> jnp.ndarray:
    """HLSL frac: x - floor(x) (terrain_vs.hlsl:12)."""
    return x - jnp.floor(x)


# ---------------------------------------------------------------------------
# Affine transforms (row-vector convention)
# ---------------------------------------------------------------------------

def affine_identity() -> jnp.ndarray:
    return jnp.concatenate([jnp.eye(3), jnp.zeros((1, 3))], axis=0)


def affine_scaling(s: jnp.ndarray) -> jnp.ndarray:
    """math::scaling(float3) -> (..., 4, 3) affine.

    Reference: TerrainPass.cpp:245 builds the instance transform as
    scaling(extents) * translation(position).
    """
    s = jnp.asarray(s)
    batch = s.shape[:-1]
    lin = jnp.zeros(batch + (3, 3), s.dtype)
    idx = jnp.arange(3)
    lin = lin.at[..., idx, idx].set(s)
    tr = jnp.zeros(batch + (1, 3), s.dtype)
    return jnp.concatenate([lin, tr], axis=-2)


def affine_translation(t: jnp.ndarray) -> jnp.ndarray:
    t = jnp.asarray(t)
    batch = t.shape[:-1]
    lin = jnp.broadcast_to(jnp.eye(3, dtype=t.dtype), batch + (3, 3))
    return jnp.concatenate([lin, t[..., None, :]], axis=-2)


def affine_compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Row-vector composition: v @ (a*b) == (v @ a) @ b."""
    mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    lin = mm(a[..., :3, :], b[..., :3, :])
    tr = mm(a[..., 3:4, :], b[..., :3, :]) + b[..., 3:4, :]
    return jnp.concatenate([lin, tr], axis=-2)


def affine_apply(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 3) affine to (..., 3) points (row vectors)."""
    return _einsum("...i,...ij->...j", v, m[..., :3, :]) + m[..., 3, :]


def affine_to_homogeneous(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 3) affine -> (..., 4, 4) homogeneous (row-vector)."""
    batch = m.shape[:-2]
    col = jnp.zeros(batch + (4, 1), m.dtype)
    col = col.at[..., 3, 0].set(1.0)
    return jnp.concatenate([m, col], axis=-1)


def affine_to_3x4(m: jnp.ndarray) -> jnp.ndarray:
    """Pack an affine into the reference's per-instance float3x4 layout.

    The HLSL side receives ``float3x4 i_instanceMatrix`` and computes
    ``mul(i_instanceMatrix, float4(pos, 1))`` (terrain_vs.hlsl:37,44) —
    a column-major pack of the affine (affineToColumnMajor,
    TerrainPass.cpp:249): rows are the output axes, columns are
    (in.x, in.y, in.z, 1) weights.
    """
    lin = m[..., :3, :]  # v' = v @ lin + tr
    tr = m[..., 3, :]
    # out_j = sum_i v_i lin[i, j] + tr_j  ->  M3x4[j, i] = lin[i, j]
    m3x4 = jnp.swapaxes(lin, -1, -2)
    return jnp.concatenate([m3x4, tr[..., :, None]], axis=-1)


def apply_3x4(m3x4: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """mul(float3x4, float4(v,1)) as in terrain_vs.hlsl:44."""
    return _einsum("...ji,...i->...j", m3x4[..., :3], v) + m3x4[..., 3]


# ---------------------------------------------------------------------------
# View / projection (row-vector; D3D-style clip space)
# ---------------------------------------------------------------------------

def look_at(eye, target, up=(0.0, 1.0, 0.0)) -> jnp.ndarray:
    """World -> view affine (4,3), right-handed, camera looks down -Z.

    Matches donut's FirstPersonCamera::LookAt + GetWorldToViewMatrix
    (used at Renderer.cpp:97,317).
    """
    eye = jnp.asarray(eye, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    fwd = normalize(target - eye)          # view -Z
    right = normalize(jnp.cross(fwd, up))  # view +X
    vup = jnp.cross(right, fwd)            # view +Y
    # Row-vector world->view: columns of the linear part are view axes.
    lin = jnp.stack([right, vup, -fwd], axis=-1)
    tr = -jnp.stack(
        [jnp.dot(eye, right), jnp.dot(eye, vup), jnp.dot(eye, -fwd)]
    )
    return jnp.concatenate([lin, tr[None, :]], axis=0)


def persp_proj_d3d_style(
    vfov_radians: float, aspect: float, z_near: float, z_far: float
) -> jnp.ndarray:
    """math::perspProjD3DStyle equivalent (Renderer.cpp:315).

    Row-vector, right-handed view space (camera at origin looking -Z),
    D3D clip conventions: after ``clip = view @ P``,
    ``clip.w = -view.z`` (positive in front) and ndc z = clip.z/clip.w
    in [0, 1] (0 at near, 1 at far).
    """
    y_scale = 1.0 / math.tan(vfov_radians * 0.5)
    x_scale = y_scale / aspect
    # ndc_z = (a*z + b) / (-z): 0 at z=-near, 1 at z=-far
    a = z_far / (z_near - z_far)
    b = z_near * z_far / (z_near - z_far)
    return jnp.array(
        [
            [x_scale, 0.0, 0.0, 0.0],
            [0.0, y_scale, 0.0, 0.0],
            [0.0, 0.0, a, -1.0],
            [0.0, 0.0, b, 0.0],
        ],
        jnp.float32,
    )


def ortho_proj_d3d_style(
    left: float, right: float, bottom: float, top: float,
    z_near: float, z_far: float,
) -> jnp.ndarray:
    """Row-vector right-handed ortho with D3D z in [0,1].

    Used for the directional-light shadow view (the reference gets this
    from donut's CascadedShadowMap::SetupForPlanarViewStable,
    Renderer.cpp:348).
    """
    rl = right - left
    tb = top - bottom
    fn = z_far - z_near
    return jnp.array(
        [
            [2.0 / rl, 0.0, 0.0, 0.0],
            [0.0, 2.0 / tb, 0.0, 0.0],
            [0.0, 0.0, -1.0 / fn, 0.0],
            [-(right + left) / rl, -(top + bottom) / tb, -z_near / fn, 1.0],
        ],
        jnp.float32,
    )


def transform_points_h(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) points through a (4, 4) row-vector matrix -> (..., 4)."""
    return (
        _einsum("...i,ij->...j", v, m[:3, :]) + m[3, :]
    )


def view_proj(world_to_view: jnp.ndarray, proj: jnp.ndarray) -> jnp.ndarray:
    """Compose (4,3) world->view affine with (4,4) projection -> (4,4)."""
    return jnp.matmul(affine_to_homogeneous(world_to_view), proj, precision=jax.lax.Precision.HIGHEST)


def inverse_affine(m: jnp.ndarray) -> jnp.ndarray:
    """Invert a (4, 3) row-vector affine."""
    lin_inv = jnp.linalg.inv(m[:3, :])
    tr = -jnp.matmul(m[3, :], lin_inv, precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([lin_inv, tr[None, :]], axis=0)


def inverse_4x4(m: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.inv(m)


# ---------------------------------------------------------------------------
# Frustum (reproduces dm::frustum semantics from the view-proj matrix)
# ---------------------------------------------------------------------------

def frustum_planes(vp: jnp.ndarray) -> jnp.ndarray:
    """Extract 6 planes (nx, ny, nz, d) with inside: n.p + d >= 0.

    For row-vector clip = p_h @ VP with D3D conventions, the planes are
    combinations of VP columns: left w+x, right w-x, bottom w+y, top w-y,
    near z (z>=0), far w-z. Matches dm::frustum(viewProjMatrix) as used
    by donut's IView::GetViewFrustum (QuadTree.cpp:99 call site).
    Returns (6, 4).
    """
    c = vp.T  # c[i] = i-th column as a length-4 vector over (x,y,z,1)
    x, y, z, w = c[0], c[1], c[2], c[3]
    planes = jnp.stack(
        [
            w + x,  # left
            w - x,  # right
            w + y,  # bottom
            w - y,  # top
            z,      # near (clip z >= 0)
            w - z,  # far
        ],
        axis=0,
    )
    return planes  # (6, 4): n = planes[:, :3], d = planes[:, 3]


def frustum_intersects_box(
    planes: jnp.ndarray, box_min: jnp.ndarray, box_max: jnp.ndarray
) -> jnp.ndarray:
    """Conservative AABB-vs-frustum: the p-vertex test.

    Matches dm::frustum::intersectsWith(box3) semantics (QuadTree.cpp:99):
    returns False only if the box is fully outside some plane.
    Shapes: planes (6, 4); box_min/box_max (..., 3); returns (...,) bool.
    """
    n = planes[:, :3]  # (6, 3)
    d = planes[:, 3]  # (6,)
    # farthest-inside corner per plane
    p_vert = jnp.where(n >= 0.0, box_max[..., None, :], box_min[..., None, :])
    dist = jnp.sum(p_vert * n, axis=-1) + d  # (..., 6)
    return jnp.all(dist >= 0.0, axis=-1)


def aabb_dist2_xz(
    pos: jnp.ndarray, box_min: jnp.ndarray, box_max: jnp.ndarray
) -> jnp.ndarray:
    """Squared XZ distance from a point to an AABB.

    Matches Node::Intersects (QuadTree.h:31-45): the Y axis is
    deliberately ignored (commented out in the reference).
    Shapes: pos (..., 3) or (3,); box_min/max (..., 3).
    """
    dx = jnp.where(
        pos[..., 0] < box_min[..., 0],
        pos[..., 0] - box_min[..., 0],
        jnp.where(pos[..., 0] > box_max[..., 0], pos[..., 0] - box_max[..., 0], 0.0),
    )
    dz = jnp.where(
        pos[..., 2] < box_min[..., 2],
        pos[..., 2] - box_min[..., 2],
        jnp.where(pos[..., 2] > box_max[..., 2], pos[..., 2] - box_max[..., 2], 0.0),
    )
    return dx * dx + dz * dz


# ---------------------------------------------------------------------------
# Viewport
# ---------------------------------------------------------------------------

def clip_to_screen(
    clip: jnp.ndarray, width: int, height: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Clip space -> pixel coordinates (D3D viewport transform).

    Pixel centers at integer+0.5 (D3D11 rasterization rules). Y flips:
    ndc +y is up, pixel +y is down. Returns (xy_pixels, ndc_z, inv_w).
    """
    w = clip[..., 3]
    inv_w = 1.0 / w
    ndc = clip[..., :3] * inv_w[..., None]
    sx = (ndc[..., 0] * 0.5 + 0.5) * width
    sy = (0.5 - ndc[..., 1] * 0.5) * height
    return jnp.stack([sx, sy], axis=-1), ndc[..., 2], inv_w
