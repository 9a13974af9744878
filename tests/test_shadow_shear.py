"""Unit coverage for the sun-ray-aligned sheared light projection
(shadow.sun_shear_matrices / shear_map_heights /
factors_from_sun_shear_map) — the map-mode shadow math.

The defining property: two world points on the SAME sun ray must land
on the SAME map pixel, with depth ordering along the ray (higher =
closer to a descending sun). That is what makes the depth raster a
shadow map; everything else (lattice alignment, height recovery, slab
sampling) is checked against direct evaluation.
"""

import numpy as np

import jax.numpy as jnp

from vrenderer_tpu.ops import shadow
from vrenderer_tpu.utils import math3d

WS = 64.0
RES = 128


def _mats(light):
    return shadow.sun_shear_matrices(
        jnp.asarray(light, jnp.float32), WS, jnp.float32(12.0), RES
    )


def test_same_sun_ray_same_pixel_depth_ordered():
    rng = np.random.default_rng(3)
    light = np.asarray([-0.6, -0.5, 0.25], np.float32)
    light /= np.linalg.norm(light)
    wtc, kx, kz, sx, sz = _mats(light)
    wtc = np.asarray(wtc)

    pts = rng.uniform(-20, 20, size=(32, 3)).astype(np.float32)
    pts[:, 1] = rng.uniform(0, 12, size=32)
    # march each point ALONG the light travel direction
    t = rng.uniform(0.5, 5.0, size=(32, 1)).astype(np.float32)
    pts2 = pts + t * light[None, :]

    c1 = np.asarray(math3d.transform_points_h(jnp.asarray(wtc),
                                              jnp.asarray(pts)))
    c2 = np.asarray(math3d.transform_points_h(jnp.asarray(wtc),
                                              jnp.asarray(pts2)))
    # same ray -> same map xy (ndc), to float tolerance
    np.testing.assert_allclose(c1[:, 0], c2[:, 0], atol=1e-5)
    np.testing.assert_allclose(c1[:, 1], c2[:, 1], atol=1e-5)
    # moving along the light DESCENDS (light.y < 0), so depth GROWS
    assert np.all(c2[:, 2] > c1[:, 2])


def test_shear_map_heights_roundtrip():
    """depth z01 of a world point -> shear_map_heights recovers its y."""
    light = np.asarray([-0.3, -0.8, 0.1], np.float32)
    wtc, *_ = _mats(light)
    pts = jnp.asarray(
        [[3.0, 7.5, -2.0], [-10.0, 0.0, 4.0], [0.0, 11.9, 0.0]],
        jnp.float32,
    )
    clip = math3d.transform_points_h(wtc, pts)
    z01 = clip[:, 2]
    h = shadow.shear_map_heights(z01, jnp.ones_like(z01, bool))
    np.testing.assert_allclose(
        np.asarray(h), np.asarray(pts[:, 1]), atol=2e-3
    )


def test_pixel_centers_on_span_lattice():
    """Pixel (row, col) centers must land on the span's texel lattice:
    world x = -span_x/2 + col * span_x/(RES-1) (mesh_top_field's
    half-texel construction) — the contract factors_from_sun_shear_map's
    u01 mapping relies on."""
    light = np.asarray([-0.5, -0.7, 0.3], np.float32)
    wtc, kx, kz, sx, sz = _mats(light)
    sx = float(sx)
    sz = float(sz)
    # ground points (y=0) on the claimed lattice
    cols = np.asarray([0, 1, RES // 2, RES - 1], np.float32)
    x = -sx / 2 + cols * sx / (RES - 1)
    pts = jnp.asarray(np.stack([x, 0 * x, 0 * x], axis=-1))
    clip = np.asarray(math3d.transform_points_h(wtc, pts))
    px = (clip[:, 0] + 1.0) * 0.5 * RES - 0.5
    np.testing.assert_allclose(px, cols, atol=1e-3)


def test_factors_match_pointwise_comparison():
    """The slab-blend separable sampler must agree with a brute-force
    per-texel comparison (sample s0 at the exact ground intersection,
    compare against receiver height) away from penumbra edges."""
    rng = np.random.default_rng(11)
    light = np.asarray([-0.6, -0.6, 0.2], np.float32)
    wtc, kx, kz, sx, sz = _mats(light)
    hm = jnp.asarray(rng.random((32, 32), np.float32))
    max_h = jnp.float32(12.0)

    # synthetic occluder-height map: a tall ridge plus ground
    s0 = np.full((RES, RES), -1e9, np.float32)
    s0[:, : RES // 2] = 0.0
    s0[40:60, :] = 10.0
    s0 = jnp.asarray(s0)

    fac = np.asarray(shadow.factors_from_sun_shear_map(
        s0, hm, max_h, WS, kx, kz, sx, sz, jnp.float32(1.0),
        num_slabs=25,
    ))

    # brute force at every terrain texel
    from vrenderer_tpu.ops import texture

    gx = np.linspace(-WS / 2, WS / 2, 32)
    gz = np.linspace(-WS / 2, WS / 2, 32)
    X, Z = np.meshgrid(gx, gz)
    Hh = np.asarray(hm) * 12.0
    u = (X + Hh * float(kx)) / float(sx) + 0.5
    v = (Z + Hh * float(kz)) / float(sz) + 0.5
    s_at = np.asarray(texture.sample_points(
        s0, jnp.asarray(u.ravel()), jnp.asarray(v.ravel())
    )).reshape(32, 32)
    want_lit = (Hh + 2.0 >= s_at)

    confident = np.abs(Hh + 2.0 - s_at) > 1.5  # away from the boundary
    agree = (fac > 0.5) == want_lit
    assert agree[confident].mean() > 0.97


def test_sun_below_horizon_fully_dark():
    hm = jnp.asarray(np.random.default_rng(0).random((16, 16), np.float32))
    s0 = jnp.zeros((RES, RES), jnp.float32)
    fac = shadow.factors_from_sun_shear_map(
        s0, hm, jnp.float32(12.0), WS, jnp.float32(1.0), jnp.float32(0.0),
        jnp.float32(WS), jnp.float32(WS), jnp.float32(-0.2),
    )
    assert float(jnp.max(fac)) == 0.0
