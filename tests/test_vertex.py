import jax.numpy as jnp
import numpy as np

from vrenderer_tpu.config import TerrainSettings
from vrenderer_tpu.ops import vertex
from vrenderer_tpu.terrain.quadtree import SelectedInstances

SET = TerrainSettings(surface_size=64, world_size=64, max_instances=8, grid_size=8)


def _instances(nodes):
    cap = SET.max_instances
    pos = np.zeros((cap, 3), np.float32)
    ext = np.zeros((cap, 3), np.float32)
    lod = np.zeros((cap,), np.int32)
    valid = np.zeros((cap,), bool)
    for i, (p, e, l) in enumerate(nodes):
        pos[i] = p
        ext[i] = e
        lod[i] = l
        valid[i] = True
    return SelectedInstances(
        position=jnp.asarray(pos),
        extents=jnp.asarray(ext),
        lod=jnp.asarray(lod),
        valid=jnp.asarray(valid),
        count=jnp.int32(len(nodes)),
    )


def _smooth_heightmap(res=64):
    y, x = np.meshgrid(np.linspace(0, 1, res), np.linspace(0, 1, res), indexing="ij")
    return jnp.asarray(
        (0.5 + 0.3 * np.sin(x * 4.1) * np.cos(y * 3.3)).astype(np.float32)
    )


def _run_both(inst, cam, hm, max_h=10.0):
    lr = SET.lod_ranges()
    alb = jnp.stack([hm, hm, hm], axis=-1)
    shad = jnp.ones_like(hm)
    out = vertex.vertex_stage(SET, inst, jnp.asarray(cam, jnp.float32), hm, alb,
                              shad, jnp.float32(max_h), lr)
    exact = vertex.vertex_stage_exact(SET, inst, jnp.asarray(cam, jnp.float32),
                                      hm, jnp.float32(max_h), lr)
    return out, exact


def test_no_morph_near_camera_matches_exact():
    # camera on top of the node center: distances << 0.85*range -> k = 0
    inst = _instances([((0.0, 0.0, 0.0), (1.0, 0.0, 1.0), 1)])
    hm = _smooth_heightmap()
    out, exact = _run_both(inst, [0.0, 1.0, 0.0], hm)
    np.testing.assert_allclose(
        np.asarray(out.world[0]), np.asarray(exact[0]), atol=1e-5
    )


def test_full_morph_far_from_camera_matches_exact():
    # node far outside its lod range -> k = 1 everywhere; fast path must be
    # bit-compatible with the reference formulation (positions coincide)
    inst = _instances([((0.0, 0.0, 0.0), (1.0, 0.0, 1.0), 1)])
    hm = _smooth_heightmap()
    out, exact = _run_both(inst, [500.0, 1.0, 0.0], hm)
    np.testing.assert_allclose(
        np.asarray(out.world[0]), np.asarray(exact[0]), atol=1e-4
    )
    # odd vertices collapsed onto even-floor neighbours
    w = np.asarray(out.world[0])
    np.testing.assert_allclose(w[:, 1], w[:, 0], atol=1e-5)  # col 1 -> col 0


def test_partial_morph_close_to_exact_on_smooth_field():
    inst = _instances([((0.0, 0.0, 0.0), (4.0, 0.0, 4.0), 3)])
    hm = _smooth_heightmap()
    # place camera so distances fall inside the morph band of lod 3
    # (gridExtents = 8 -> lod 3, range 32, band [27.2, 32])
    out, exact = _run_both(inst, [30.0, 1.0, 0.0], hm)
    w, e = np.asarray(out.world[0]), np.asarray(exact[0])
    np.testing.assert_allclose(w[..., 0], e[..., 0], atol=1e-5)  # x identical
    np.testing.assert_allclose(w[..., 2], e[..., 2], atol=1e-5)  # z identical
    assert np.max(np.abs(w[..., 1] - e[..., 1])) < 0.15  # height close


def test_morph_k_formula():
    lr = SET.lod_ranges()
    # gridExtents = 8 -> lod = 3 -> range 32, start 27.2
    k = vertex.morph_k(jnp.asarray([0.0, 27.2, 29.6, 32.0, 100.0]),
                       jnp.float32(8.0), lr)
    np.testing.assert_allclose(np.asarray(k), [0.0, 0.0, 0.5, 1.0, 1.0], atol=1e-5)


def test_adjacent_same_lod_nodes_share_edge_vertices():
    # two neighbouring nodes at the same depth: the shared edge must produce
    # identical world positions (crack-free)
    inst = _instances(
        [
            ((-1.0, 0.0, 0.0), (1.0, 0.0, 1.0), 1),
            ((1.0, 0.0, 0.0), (1.0, 0.0, 1.0), 1),
        ]
    )
    hm = _smooth_heightmap()
    out, _ = _run_both(inst, [5.0, 3.0, 2.0], hm)
    w = np.asarray(out.world)
    # right edge of node 0 == left edge of node 1
    np.testing.assert_allclose(w[0, :, -1, :], w[1, :, 0, :], atol=1e-5)


def test_attrs_shapes_and_normal_unit_length():
    inst = _instances([((0.0, 0.0, 0.0), (1.0, 0.0, 1.0), 1)])
    hm = _smooth_heightmap()
    out, _ = _run_both(inst, [0.0, 1.0, 0.0], hm)
    assert out.attrs.shape == (SET.max_instances, 9, 9, vertex.NUM_ATTRS)
    n = np.asarray(out.attrs[0, ..., vertex.ATTR_NORMAL])
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)
    assert np.all(n[..., 1] > 0)  # upward-facing terrain normals


def test_shifted_field_matches_pointwise():
    from vrenderer_tpu.ops import texture

    hm = _smooth_heightmap(32)
    sh = vertex.shifted_field(hm, 0.1, 0.0)
    u = jnp.linspace(0, 1, 32)
    v = jnp.linspace(0, 1, 32)
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    expect = texture.sample_points(hm, jnp.clip(uu + 0.1, 0, 1), vv)
    np.testing.assert_allclose(np.asarray(sh), np.asarray(expect), atol=1e-5)
