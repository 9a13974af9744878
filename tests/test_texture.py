import jax.numpy as jnp
import numpy as np

from vrenderer_tpu.ops import texture


def _ref_bilinear(tex, u, v):
    H, W = tex.shape[:2]
    x = np.clip(u, 0, 1) * (W - 1)
    y = np.clip(v, 0, 1) * (H - 1)
    x0 = np.floor(x).astype(int); y0 = np.floor(y).astype(int)
    x1 = np.minimum(x0 + 1, W - 1); y1 = np.minimum(y0 + 1, H - 1)
    fx = x - x0; fy = y - y0
    if tex.ndim == 3:
        fx = fx[..., None]; fy = fy[..., None]
    a = tex[y0, x0]; b = tex[y0, x1]; c = tex[y1, x0]; d = tex[y1, x1]
    return (a * (1 - fx) + b * fx) * (1 - fy) + (c * (1 - fx) + d * fx) * fy


def test_separable_matches_pointwise_bilinear():
    rng = np.random.default_rng(0)
    tex = rng.random((16, 24)).astype(np.float32)
    u = rng.random(7).astype(np.float32)
    v = rng.random(5).astype(np.float32)
    got = texture.sample_separable(jnp.asarray(tex), jnp.asarray(u), jnp.asarray(v))
    uu, vv = np.meshgrid(u, v, indexing="xy")
    expect = _ref_bilinear(tex, uu, vv)
    np.testing.assert_allclose(np.asarray(got), expect, atol=1e-5)


def test_separable_multichannel():
    rng = np.random.default_rng(1)
    tex = rng.random((8, 8, 3)).astype(np.float32)
    u = np.array([0.0, 0.5, 1.0], np.float32)
    v = np.array([0.25, 0.75], np.float32)
    got = texture.sample_separable(jnp.asarray(tex), jnp.asarray(u), jnp.asarray(v))
    uu, vv = np.meshgrid(u, v, indexing="xy")
    expect = _ref_bilinear(tex, uu, vv)
    assert got.shape == (2, 3, 3)
    np.testing.assert_allclose(np.asarray(got), expect, atol=1e-5)


def test_sample_points_matches_separable_on_grid():
    rng = np.random.default_rng(2)
    tex = jnp.asarray(rng.random((32, 32)).astype(np.float32))
    u = jnp.asarray(rng.random(9).astype(np.float32))
    v = jnp.asarray(rng.random(9).astype(np.float32))
    sep = texture.sample_separable(tex, u, v)
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    pts = texture.sample_points(tex, uu, vv)
    np.testing.assert_allclose(np.asarray(sep), np.asarray(pts), atol=1e-5)


def test_clamp_addressing_outside_range():
    tex = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
    u = jnp.array([-0.5, 1.5], jnp.float32)
    v = jnp.array([-1.0, 2.0], jnp.float32)
    got = texture.sample_separable(tex, u, v)
    np.testing.assert_allclose(np.asarray(got), [[0.0, 3.0], [12.0, 15.0]])


def test_batched_instance_sampling():
    # per-instance u/v rows with leading batch dim — the vertex-stage shape
    rng = np.random.default_rng(3)
    tex = jnp.asarray(rng.random((16, 16)).astype(np.float32))
    u = jnp.asarray(rng.random((4, 5)).astype(np.float32))  # (I, nu)
    v = jnp.asarray(rng.random((4, 5)).astype(np.float32))
    got = texture.sample_separable(tex, u, v)
    assert got.shape == (4, 5, 5)
    for i in range(4):
        uu, vv = np.meshgrid(np.asarray(u[i]), np.asarray(v[i]), indexing="xy")
        expect = _ref_bilinear(np.asarray(tex), uu, vv)
        np.testing.assert_allclose(np.asarray(got[i]), expect, atol=1e-5)


def test_world_to_uv():
    uv = texture.world_to_uv(jnp.array([-1024.0, 1024.0]), 2048.0)
    np.testing.assert_allclose(np.asarray(uv), [0.0, 1.0])
