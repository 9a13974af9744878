import jax.numpy as jnp
import numpy as np
import pytest

from vrenderer_tpu.utils import math3d


def test_affine_compose_matches_sequential_apply():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    ab = math3d.affine_compose(a, b)
    expect = math3d.affine_apply(b, math3d.affine_apply(a, v))
    np.testing.assert_allclose(math3d.affine_apply(ab, v), expect, atol=1e-5)


def test_scaling_then_translation_matches_reference_order():
    # TerrainPass.cpp:245-247: transform = scaling(extents) * translation(pos)
    ext = jnp.array([2.0, 0.0, 3.0])
    pos = jnp.array([10.0, 0.0, -5.0])
    m = math3d.affine_compose(math3d.affine_scaling(ext), math3d.affine_translation(pos))
    v = jnp.array([1.0, 0.0, -1.0])  # grid corner in [-1,1]
    out = math3d.affine_apply(m, v)
    np.testing.assert_allclose(out, [12.0, 0.0, -8.0], atol=1e-6)


def test_3x4_pack_matches_affine_apply():
    rng = np.random.default_rng(1)
    m = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(3,)), jnp.float32)
    m34 = math3d.affine_to_3x4(m)
    np.testing.assert_allclose(
        math3d.apply_3x4(m34, v), math3d.affine_apply(m, v), atol=1e-5
    )


def test_lookat_maps_target_to_minus_z():
    eye = jnp.array([0.0, 205.0, 227.4])
    target = jnp.array([1.0, 1.8, 0.0])
    w2v = math3d.look_at(eye, target)
    vt = math3d.affine_apply(w2v, target)
    # target straight ahead: x ~ 0, y ~ 0, z negative
    assert abs(float(vt[0])) < 1e-3
    assert abs(float(vt[1])) < 1e-3
    assert float(vt[2]) < 0
    # eye maps to origin
    np.testing.assert_allclose(math3d.affine_apply(w2v, eye), 0.0, atol=1e-4)


def test_perspective_depth_range_and_w():
    proj = math3d.persp_proj_d3d_style(np.radians(60.0), 16 / 9, 0.1, 10000.0)
    near_pt = jnp.array([0.0, 0.0, -0.1])
    far_pt = jnp.array([0.0, 0.0, -10000.0])
    cn = math3d.transform_points_h(proj, near_pt)
    cf = math3d.transform_points_h(proj, far_pt)
    assert cn[3] > 0 and cf[3] > 0  # w = -view.z, positive in front
    np.testing.assert_allclose(cn[2] / cn[3], 0.0, atol=1e-6)
    np.testing.assert_allclose(cf[2] / cf[3], 1.0, atol=1e-6)


def test_frustum_contains_points_in_view():
    eye = jnp.array([0.0, 10.0, 0.0])
    target = jnp.array([0.0, 10.0, -10.0])
    w2v = math3d.look_at(eye, target)
    proj = math3d.persp_proj_d3d_style(np.radians(60.0), 1.0, 0.1, 1000.0)
    vp = math3d.view_proj(w2v, proj)
    planes = math3d.frustum_planes(vp)

    # box straight ahead: intersects
    ok = math3d.frustum_intersects_box(
        planes, jnp.array([-1.0, 9.0, -21.0]), jnp.array([1.0, 11.0, -19.0])
    )
    assert bool(ok)
    # box behind camera: rejected
    bad = math3d.frustum_intersects_box(
        planes, jnp.array([-1.0, 9.0, 19.0]), jnp.array([1.0, 11.0, 21.0])
    )
    assert not bool(bad)
    # box far beyond far plane: rejected
    bad2 = math3d.frustum_intersects_box(
        planes, jnp.array([-1.0, 9.0, -3000.0]), jnp.array([1.0, 11.0, -2500.0])
    )
    assert not bool(bad2)
    # huge box containing the whole frustum: intersects
    ok2 = math3d.frustum_intersects_box(
        planes, jnp.array([-5000.0, -5000.0, -5000.0]), jnp.array([5000.0, 5000.0, 5000.0])
    )
    assert bool(ok2)


def test_aabb_dist2_xz_ignores_y():
    # matches Node::Intersects with the y axis commented out (QuadTree.h:39-40)
    bmin = jnp.array([0.0, 0.0, 0.0])
    bmax = jnp.array([2.0, 0.0, 2.0])
    pos = jnp.array([5.0, 100.0, 1.0])
    np.testing.assert_allclose(math3d.aabb_dist2_xz(pos, bmin, bmax), 9.0, atol=1e-6)
    inside = jnp.array([1.0, -50.0, 1.0])
    np.testing.assert_allclose(math3d.aabb_dist2_xz(inside, bmin, bmax), 0.0)


def test_clip_to_screen_center_and_corners():
    # ndc (0,0) -> pixel center of the image
    clip = jnp.array([0.0, 0.0, 0.5, 1.0])
    xy, z, inv_w = math3d.clip_to_screen(clip, 640, 480)
    np.testing.assert_allclose(xy, [320.0, 240.0], atol=1e-4)
    # ndc (-1, +1) (top-left in D3D) -> pixel (0, 0)
    clip = jnp.array([-2.0, 2.0, 0.0, 2.0])
    xy, _, _ = math3d.clip_to_screen(clip, 640, 480)
    np.testing.assert_allclose(xy, [0.0, 0.0], atol=1e-4)
