"""Oracle test: the vectorized selection must reproduce the reference's
recursive QuadTree::NodeSelect (QuadTree.cpp:80-131) exactly, including:

* XZ-only range test against squared ranges (QuadTree.h:31-45, the y axis
  is commented out; QuadTree.cpp:82 passes range^2),
* the frustum AABB test with y in [0, camera.y] because height fitting
  never runs (QuadTree.cpp:87-96 with m_HeightLoaded == false),
* out-of-frustum nodes returning true so parents don't re-emit them
  (QuadTree.cpp:99-103),
* parents emitting a child at the child's own bounds when the child's
  NodeSelect returns false (QuadTree.cpp:120-127).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vrenderer_tpu.config import TerrainSettings
from vrenderer_tpu.terrain import quadtree
from vrenderer_tpu.utils import math3d


# ---------------------------------------------------------------------------
# Python oracle: straight port of the reference recursion
# ---------------------------------------------------------------------------

class _Node:
    def __init__(self, pos, ext):
        self.pos = np.asarray(pos, np.float64)
        self.ext = np.asarray(ext, np.float64)
        self.children = []

    def intersects(self, position, radius2):
        mn = self.pos - self.ext
        mx = self.pos + self.ext
        d = np.zeros(3)
        for axis in (0, 2):  # y axis skipped, QuadTree.h:39-40
            if position[axis] < mn[axis]:
                d[axis] = position[axis] - mn[axis]
            elif position[axis] > mx[axis]:
                d[axis] = position[axis] - mx[axis]
        return float(d @ d) <= radius2


def _split(node, num_splits, num_lods):
    e = node.ext / 2.0
    offsets = [
        np.array([-e[0], 0.0, e[2]]),
        e.copy(),
        -e.copy(),
        -np.array([-e[0], 0.0, e[2]]),
    ]
    node.children = [_Node(node.pos + o, e) for o in offsets]
    if num_splits + 1 <= num_lods:
        for c in node.children:
            _split(c, num_splits + 1, num_lods)


def _frustum_intersects(planes, bmin, bmax):
    planes = np.asarray(planes)
    for p in planes:
        n, d = p[:3], p[3]
        pv = np.where(n >= 0, bmax, bmin)
        if pv @ n + d < 0:
            return False
    return True


def _node_select(pos, node, lod, planes, ranges, selected):
    if not node.intersects(pos, ranges[lod] ** 2):
        return False
    bmin = node.pos - node.ext
    bmax = node.pos + node.ext
    bmin = bmin.copy(); bmax = bmax.copy()
    bmin[1] = 0.0
    bmax[1] = pos[1]  # m_HeightLoaded == false branch, QuadTree.cpp:93-96
    if not _frustum_intersects(planes, bmin, bmax):
        return True
    if lod == 0:
        selected.append(node)
        return True
    if not node.intersects(pos, ranges[lod - 1] ** 2):
        selected.append(node)
    else:
        for c in node.children:
            if not _node_select(pos, c, lod - 1, planes, ranges, selected):
                selected.append(c)
    return True


def oracle_select(settings, cam, planes, location=(0.0, 0.0, 0.0)):
    ranges = [4.0 * 2.0 ** i for i in range(settings.max_lods)]
    root = _Node(location, [settings.surface_size / 2.0, 0.0, settings.surface_size / 2.0])
    _split(root, 1, settings.num_lods)
    selected = []
    _node_select(np.asarray(cam, np.float64), root, settings.num_lods, planes, ranges, selected)
    return {(round(float(n.pos[0]), 3), round(float(n.pos[2]), 3), round(float(n.ext[0]), 3)) for n in selected}


def _got_set(inst):
    pos = np.asarray(inst.position)
    ext = np.asarray(inst.extents)
    valid = np.asarray(inst.valid)
    return {
        (round(float(pos[i, 0]), 3), round(float(pos[i, 2]), 3), round(float(ext[i, 0]), 3))
        for i in range(len(valid))
        if valid[i]
    }


def _make_frustum(eye, target, aspect=1.0, vfov=60.0, far=1000.0):
    w2v = math3d.look_at(jnp.asarray(eye, jnp.float32), jnp.asarray(target, jnp.float32))
    proj = math3d.persp_proj_d3d_style(math.radians(vfov), aspect, 0.1, far)
    return np.asarray(math3d.frustum_planes(math3d.view_proj(w2v, proj)))


SET = TerrainSettings(surface_size=64, world_size=64, max_instances=512)


@pytest.mark.parametrize("seed", range(8))
def test_selection_matches_oracle_random_cameras(seed):
    rng = np.random.default_rng(seed)
    eye = np.array(
        [
            rng.uniform(-40, 40),
            rng.uniform(2, 60),
            rng.uniform(-40, 40),
        ]
    )
    target = eye + np.array(
        [rng.uniform(-1, 1), rng.uniform(-0.9, -0.1), rng.uniform(-1, 1)]
    ) * 10.0
    planes = _make_frustum(eye, target)

    expect = oracle_select(SET, eye, planes)
    inst, _ = quadtree.select_nodes(
        SET,
        jnp.asarray(eye, jnp.float32),
        jnp.asarray(planes, jnp.float32),
        SET.lod_ranges(),
    )
    got = _got_set(inst)
    assert got == expect, (
        f"mismatch: missing={expect - got} extra={got - expect}"
    )
    assert int(inst.count) == len(expect)


def test_camera_far_away_selects_nothing():
    eye = np.array([10000.0, 100.0, 10000.0])
    planes = _make_frustum(eye, eye + np.array([0.0, -1.0, -1.0]))
    expect = oracle_select(SET, eye, planes)
    inst, _ = quadtree.select_nodes(
        SET, jnp.asarray(eye, jnp.float32), jnp.asarray(planes, jnp.float32),
        SET.lod_ranges(),
    )
    assert _got_set(inst) == expect  # root fails range -> empty (not emitted)
    assert int(inst.count) == 0


def test_camera_overhead_center():
    eye = np.array([0.5, 30.0, 0.5])
    planes = _make_frustum(eye, np.array([0.0, 0.0, 0.0]))
    expect = oracle_select(SET, eye, planes)
    inst, _ = quadtree.select_nodes(
        SET, jnp.asarray(eye, jnp.float32), jnp.asarray(planes, jnp.float32),
        SET.lod_ranges(),
    )
    got = _got_set(inst)
    assert got == expect
    assert len(expect) > 0


def test_larger_surface_matches_oracle():
    settings = TerrainSettings(surface_size=256, world_size=256, max_instances=1024)
    rng = np.random.default_rng(42)
    for _ in range(3):
        eye = np.array([rng.uniform(-120, 120), rng.uniform(5, 80), rng.uniform(-120, 120)])
        target = eye + np.array([rng.uniform(-1, 1), -0.5, rng.uniform(-1, 1)]) * 20.0
        planes = _make_frustum(eye, target)
        expect = oracle_select(settings, eye, planes)
        inst, _ = quadtree.select_nodes(
            settings, jnp.asarray(eye, jnp.float32), jnp.asarray(planes, jnp.float32),
            settings.lod_ranges(),
        )
        assert _got_set(inst) == expect


def test_selection_is_jittable():
    eye = jnp.array([0.5, 30.0, 0.5], jnp.float32)
    planes = jnp.asarray(_make_frustum(np.array([0.5, 30.0, 0.5]), np.zeros(3)), jnp.float32)
    f = jax.jit(
        lambda c, p: quadtree.select_nodes(SET, c, p, SET.lod_ranges())[0]
    )
    inst = f(eye, planes)
    assert inst.position.shape == (SET.max_instances, 3)
    inst2 = f(eye + 0.001, planes)
    assert int(inst2.count) >= 0
