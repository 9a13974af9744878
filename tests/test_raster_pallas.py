"""Pallas rasterizer vs the XLA oracle on a real terrain scene
(interpret mode on CPU). Must agree on z, id, and attributes."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from vrenderer_tpu.config import TerrainSettings
from vrenderer_tpu.camera import Camera, make_view_constants
from vrenderer_tpu.ops import raster, raster_pallas, vertex
from vrenderer_tpu.terrain import grid as gridmod
from vrenderer_tpu.terrain import quadtree
from vrenderer_tpu.utils import math3d

SET = TerrainSettings(surface_size=64, world_size=64, max_instances=64, grid_size=8)
W, H = 256, 128  # two 128x128 supertiles


def _scene(eye, target, seed=0):
    rng = np.random.default_rng(seed)
    hm = jnp.asarray(
        (0.5 + 0.45 * np.sin(np.linspace(0, 6, 64))[None, :]
         * np.cos(np.linspace(0, 5, 64))[:, None]).astype(np.float32)
    )
    alb = jnp.asarray(rng.random((64, 64, 3)).astype(np.float32))
    shad = jnp.asarray(rng.random((64, 64)).astype(np.float32))

    cam = Camera(
        eye=jnp.asarray(eye, jnp.float32),
        target=jnp.asarray(target, jnp.float32),
        up=jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
    )
    vc = make_view_constants(cam, W, H, 60.0, 0.1, 1000.0)
    planes = math3d.frustum_planes(vc["world_to_clip"])
    inst, _ = quadtree.select_nodes(SET, cam.eye, planes, SET.lod_ranges())
    vout = vertex.vertex_stage(
        SET, inst, cam.eye, hm, alb, shad, jnp.float32(12.0), SET.lod_ranges()
    )
    _, tris = gridmod.make_grid(SET.grid_size)
    setup = raster.setup_triangles(
        vout.world, vout.attrs, inst.valid, tris, vc["world_to_clip"], W, H
    )
    return inst, vout, setup, vc


def _run_both(eye, target, win_w=128, two_phase=False):
    inst, vout, setup, vc = _scene(eye, target)
    T = SET.tris_per_instance
    I = SET.max_instances

    z_x, id_x, at_x = raster.rasterize_xla(setup, W, H, tile=(8, 128), batch=64)

    packed = raster_pallas.pack_tri_data(setup, I, T, tri_batch=64)
    bbox, usable, dist = raster_pallas.instance_screen_bbox(
        vout.world, vc["world_to_clip"], W, H, inst.valid
    )
    work = raster_pallas.build_work_list(
        bbox, usable, W, H, tile=128, tris_per_inst=T, max_work=256,
        order_key=dist, packed=packed, compact_k=16, win_w=win_w,
    )
    fn = (raster_pallas.rasterize_pallas_two_phase if two_phase
          else raster_pallas.rasterize_pallas)
    z_p, id_p, at_p, _ = fn(
        packed, work, W, H, tile=128, sub_h=8, compact_k=16,
        max_work=256, interpret=True, win_w=win_w,
    )
    return (z_x, id_x, at_x), (z_p, id_p, at_p), inst


def test_pallas_matches_xla_oracle_frontal_view():
    (z_x, id_x, at_x), (z_p, id_p, at_p), inst = _run_both(
        [0.0, 20.0, 40.0], [0.0, 0.0, 0.0]
    )
    id_x = np.asarray(id_x)
    id_p = np.asarray(id_p)
    covered = id_x >= 0
    assert covered.sum() > 2000, "scene must cover a good chunk of screen"
    np.testing.assert_array_equal(id_p, id_x)
    np.testing.assert_allclose(np.asarray(z_p)[covered], np.asarray(z_x)[covered],
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(at_p)[covered], np.asarray(at_x)[covered], atol=3e-4
    )


def test_pallas_matches_xla_oracle_oblique_view():
    (z_x, id_x, at_x), (z_p, id_p, at_p), _ = _run_both(
        [25.0, 8.0, 25.0], [-10.0, 2.0, -10.0]
    )
    id_x = np.asarray(id_x)
    id_p = np.asarray(id_p)
    covered = id_x >= 0
    assert covered.sum() > 1000
    np.testing.assert_array_equal(id_p, id_x)
    np.testing.assert_allclose(
        np.asarray(at_p)[covered], np.asarray(at_x)[covered], atol=3e-4
    )


def test_pallas_windowed_compaction_matches_oracle():
    """win_w=32 (x-windowed cells) must agree with the oracle exactly —
    same winners and z as the full-width layout, pixels stitched back in
    the right order."""
    (z_x, id_x, at_x), (z_p, id_p, at_p), _ = _run_both(
        [25.0, 8.0, 25.0], [-10.0, 2.0, -10.0], win_w=32
    )
    id_x = np.asarray(id_x)
    id_p = np.asarray(id_p)
    covered = id_x >= 0
    assert covered.sum() > 1000
    np.testing.assert_array_equal(id_p, id_x)
    np.testing.assert_allclose(
        np.asarray(z_p)[covered], np.asarray(z_x)[covered], rtol=0,
        atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(at_p)[covered], np.asarray(at_x)[covered], atol=3e-4
    )


def test_two_phase_bitwise_identical_frontal():
    """Two-phase raster (z/id phase + winner-filtered deferred attribute
    resolve) must be BIT-identical to the single-phase kernel on every
    output: phase 1's merge reproduces the exact winner semantics and
    phase 2's one-hot accumulate reproduces the exact coefficient swap
    (each pixel's winner contributes once; all other rounds add exact
    zeros)."""
    _, (z_0, id_0, at_0), _ = _run_both([0.0, 20.0, 40.0], [0.0, 0.0, 0.0])
    (z_x, id_x, at_x), (z_b, id_b, at_b), _ = _run_both(
        [0.0, 20.0, 40.0], [0.0, 0.0, 0.0], two_phase=True
    )
    np.testing.assert_array_equal(np.asarray(id_b), np.asarray(id_0))
    np.testing.assert_array_equal(np.asarray(z_b), np.asarray(z_0))
    np.testing.assert_array_equal(np.asarray(at_b), np.asarray(at_0))
    # and still oracle-exact
    np.testing.assert_array_equal(np.asarray(id_b), np.asarray(id_x))


def test_two_phase_bitwise_identical_oblique():
    """Oblique view: overdraw + crossing instances exercise the winner
    filter (multiple instances per cell, [min, max]-range conservatism)."""
    _, (z_0, id_0, at_0), _ = _run_both([25.0, 8.0, 25.0],
                                        [-10.0, 2.0, -10.0])
    _, (z_b, id_b, at_b), _ = _run_both(
        [25.0, 8.0, 25.0], [-10.0, 2.0, -10.0], two_phase=True
    )
    np.testing.assert_array_equal(np.asarray(id_b), np.asarray(id_0))
    np.testing.assert_array_equal(np.asarray(z_b), np.asarray(z_0))
    np.testing.assert_array_equal(np.asarray(at_b), np.asarray(at_0))


def test_winner_filter_drops_only_nonwinning_cells():
    """filter_work_to_winners must keep every (item, cell) whose instance
    won pixels (exactness) while dropping a real fraction of the work
    (the point of the design)."""
    inst, vout, setup, vc = _scene([25.0, 8.0, 25.0], [-10.0, 2.0, -10.0])
    T = SET.tris_per_instance
    I = SET.max_instances
    packed = raster_pallas.pack_tri_data(setup, I, T, tri_batch=64)
    bbox, usable, dist = raster_pallas.instance_screen_bbox(
        vout.world, vc["world_to_clip"], W, H, inst.valid
    )
    work = raster_pallas.build_work_list(
        bbox, usable, W, H, tile=128, tris_per_inst=T, max_work=256,
        order_key=dist, packed=packed, compact_k=16,
    )
    _, id_pad = raster_pallas.rasterize_pallas_zid(
        packed, work, W, H, tile=128, sub_h=8, compact_k=16,
        max_work=256, interpret=True,
    )
    work2 = raster_pallas.filter_work_to_winners(
        work, id_pad, T, W, H, tile=128, sub_h=8,
    )
    r1 = np.asarray(work.sub_rounds)
    r2 = np.asarray(work2.sub_rounds)
    # never invent work; only zero out cells
    assert ((r2 == r1) | (r2 == 0)).all()
    assert r2.sum() < r1.sum(), "filter must drop some work"
    # exactness: every (item, cell) whose instance won a pixel survives
    meta = np.asarray(work.meta)
    ids = np.asarray(id_pad)
    insts = np.where(ids == raster_pallas._BIG_ID, -1, ids // T)
    n_sub = 128 // 8
    for w in range(r1.shape[1]):
        if meta[5, w] != 1:
            continue
        ty, tx_, iw = meta[6, w], meta[7, w], meta[1, w]
        tile_inst = insts[ty * 128:(ty + 1) * 128,
                          tx_ * 128:(tx_ + 1) * 128]
        for c in range(n_sub):
            cell = tile_inst[c * 8:(c + 1) * 8, :]
            if (cell == iw).any():
                assert r2[c, w] == r1[c, w], (w, c)


def test_depth_only_kernel_matches_full_z():
    """rasterize_pallas_depth (the light-view shadow raster variant) must
    produce bit-identical z to the full kernel — same compaction dots on
    the eval-channel subset, same min-merge."""
    inst, vout, setup, vc = _scene([25.0, 8.0, 25.0], [-10.0, 2.0, -10.0])
    T = SET.tris_per_instance
    I = SET.max_instances
    packed = raster_pallas.pack_tri_data(setup, I, T, tri_batch=64)
    bbox, usable, dist = raster_pallas.instance_screen_bbox(
        vout.world, vc["world_to_clip"], W, H, inst.valid
    )
    work = raster_pallas.build_work_list(
        bbox, usable, W, H, tile=128, tris_per_inst=T, max_work=256,
        order_key=dist, packed=packed, compact_k=16,
    )
    z_full, _, _, _ = raster_pallas.rasterize_pallas(
        packed, work, W, H, tile=128, sub_h=8, compact_k=16,
        max_work=256, interpret=True,
    )
    z_d = raster_pallas.rasterize_pallas_depth(
        packed, work, W, H, tile=128, sub_h=8, compact_k=16,
        max_work=256, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(z_d), np.asarray(z_full))


def test_depth_kernel_z_invariant_across_subtile_h():
    """The map-mode light raster runs at its own subtile height
    (RasterSettings.light_subtile_h — the depth kernel's round/eval
    balance flips the optimum vs the main kernel, scripts/kexp_light.py).
    z must be bit-identical across sub_h: the per-pixel result is a pure
    f32 min over covering triangles, which is order-free."""
    inst, vout, setup, vc = _scene([25.0, 8.0, 25.0], [-10.0, 2.0, -10.0])
    T = SET.tris_per_instance
    packed = raster_pallas.pack_tri_data(setup, SET.max_instances, T,
                                         tri_batch=64)
    bbox, usable, dist = raster_pallas.instance_screen_bbox(
        vout.world, vc["world_to_clip"], W, H, inst.valid
    )

    def depth_at(sub_h):
        work = raster_pallas.build_work_list(
            bbox, usable, W, H, tile=128, tris_per_inst=T, max_work=256,
            order_key=dist, packed=packed, compact_k=16, sub_h=sub_h,
        )
        return np.asarray(raster_pallas.rasterize_pallas_depth(
            packed, work, W, H, tile=128, sub_h=sub_h, compact_k=16,
            max_work=256, interpret=True,
        ))

    z8 = depth_at(8)
    assert (z8 < 1e30).sum() > 1000
    np.testing.assert_array_equal(depth_at(16), z8)
    np.testing.assert_array_equal(depth_at(4), z8)


def test_work_list_structure():
    inst, vout, setup, vc = _scene([0.0, 20.0, 40.0], [0.0, 0.0, 0.0])
    bbox, usable, dist = raster_pallas.instance_screen_bbox(
        vout.world, vc["world_to_clip"], W, H, inst.valid
    )
    packed2 = raster_pallas.pack_tri_data(
        setup, SET.max_instances, SET.tris_per_instance
    )
    work = raster_pallas.build_work_list(
        bbox, usable, W, H, tile=128, tris_per_inst=SET.tris_per_instance,
        max_work=256, order_key=dist, packed=packed2,
    )
    meta = np.asarray(work.meta)
    n = int(work.num_items)
    assert n <= 256
    st = meta[0]
    # supertile-major, non-decreasing over real items
    assert np.all(np.diff(st[:n]) >= 0)
    # every supertile appears (2 tiles here), each with first and last flags
    for s in range(2):
        rows = np.nonzero(st[:n] == s)[0]
        assert len(rows) >= 1
        assert meta[2, rows[0]] == 1          # first
        assert meta[3, rows[-1]] == 1         # last
        assert np.all(meta[2, rows[1:]] == 0)
        assert np.all(meta[3, rows[:-1]] == 0)
    # dummy leading items are invalid
    firsts = np.nonzero(meta[2, :n] == 1)[0]
    assert np.all(meta[5, firsts] == 0)


def test_two_phase_full_frame_identical():
    """Renderer-level parity: a full frame (lighting, shadows, scene
    mesh) rendered with RasterSettings.two_phase must be bit-identical
    to the single-phase frame."""
    import dataclasses

    from vrenderer_tpu.config import FrameConfig, RasterSettings
    from vrenderer_tpu.renderer import Renderer, FrameParams
    from vrenderer_tpu.terrain import heightmap as hmod
    from vrenderer_tpu.models import scene as scenemod

    hm = hmod.procedural_heightmap(64, seed=5)
    alb = hmod.procedural_albedo(hm)
    cfg = FrameConfig(
        width=256, height=128,
        terrain=TerrainSettings(surface_size=64, world_size=64,
                                max_instances=64, grid_size=8),
    )
    cfg2 = dataclasses.replace(
        cfg, raster=dataclasses.replace(RasterSettings(), two_phase=True)
    )
    sc = scenemod.Scene.default()
    sc.instances[0].mesh = sc.instances[0].mesh._replace()
    cam = Camera(
        eye=jnp.asarray([3.0, 26.0, 42.0], jnp.float32),
        target=jnp.zeros((3,), jnp.float32),
        up=jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
    )
    params = FrameParams.default()._replace(max_height=jnp.float32(12.0))
    r1 = Renderer(cfg, hm, alb, raster_backend="pallas", interpret=True,
                  max_work=256, scene=sc)
    r2 = Renderer(cfg2, hm, alb, raster_backend="pallas", interpret=True,
                  max_work=256, scene=sc)
    o1 = r1.render(cam, params)
    o2 = r2.render(cam, params)
    np.testing.assert_array_equal(np.asarray(o1.ldr), np.asarray(o2.ldr))
    np.testing.assert_array_equal(np.asarray(o1.depth),
                                  np.asarray(o2.depth))
    np.testing.assert_array_equal(np.asarray(o1.prim_id),
                                  np.asarray(o2.prim_id))


def test_rect_supertiles_match_oracle_and_two_phase():
    """Rectangular supertiles (tile_h != tile): 256x64 tiles must be
    oracle-exact and the two-phase path must stay bit-identical (the
    resolve kernel stitches per-window winner rows when n_win > 1)."""
    inst, vout, setup, vc = _scene([25.0, 8.0, 25.0], [-10.0, 2.0, -10.0])
    T = SET.tris_per_instance
    I = SET.max_instances
    z_x, id_x, at_x = raster.rasterize_xla(setup, W, H, tile=(8, 128),
                                           batch=64)
    packed = raster_pallas.pack_tri_data(setup, I, T, tri_batch=64)
    bbox, usable, dist = raster_pallas.instance_screen_bbox(
        vout.world, vc["world_to_clip"], W, H, inst.valid
    )
    work = raster_pallas.build_work_list(
        bbox, usable, W, H, tile=256, tile_h=64, tris_per_inst=T,
        max_work=128, order_key=dist, packed=packed, compact_k=16,
        win_w=128,
    )
    z_p, id_p, at_p, _ = raster_pallas.rasterize_pallas(
        packed, work, W, H, tile=256, tile_h=64, sub_h=8, compact_k=16,
        max_work=128, interpret=True, win_w=128,
    )
    np.testing.assert_array_equal(np.asarray(id_p), np.asarray(id_x))
    cov = np.asarray(id_x) >= 0
    assert cov.sum() > 1000
    np.testing.assert_allclose(np.asarray(z_p)[cov], np.asarray(z_x)[cov],
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(at_p)[cov],
                               np.asarray(at_x)[cov], atol=3e-4)
    z2, i2, a2, _ = raster_pallas.rasterize_pallas_two_phase(
        packed, work, W, H, tile=256, tile_h=64, sub_h=8, compact_k=16,
        max_work=128, interpret=True, win_w=128,
    )
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(id_p))
    np.testing.assert_array_equal(np.asarray(z2), np.asarray(z_p))
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(at_p))
