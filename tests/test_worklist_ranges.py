"""Unit tests for the work list's SMEM encoding: per-(item, subtile)
compaction round counts and the early-z zmin row."""

import jax.numpy as jnp
import numpy as np

from vrenderer_tpu.ops import raster_pallas


def _packed_from_bboxes(I, T, tri_bbox, tri_valid, tri_batch=128):
    """Hand-built PackedTris: only the fields build_work_list consumes
    (tri_cols for counts, batch_meta for zmin) carry real data."""
    cols = np.zeros((I, 8, T), np.float32)
    cols[:, 0] = tri_bbox[..., 0]
    cols[:, 1] = tri_bbox[..., 1]
    cols[:, 2] = tri_bbox[..., 2]
    cols[:, 3] = tri_bbox[..., 3]
    cols[:, 4] = tri_valid.astype(np.float32)
    nb = T // tri_batch
    bm = np.zeros((I, nb, 8), np.float32)
    v = tri_valid.reshape(I, nb, tri_batch) > 0
    bb = tri_bbox.reshape(I, nb, tri_batch, 4)
    big = raster_pallas._FAR
    bm[..., 0] = np.where(v, bb[..., 0], big).min(-1)
    bm[..., 1] = np.where(v, bb[..., 1], big).min(-1)
    bm[..., 2] = np.where(v, bb[..., 2], -big).max(-1)
    bm[..., 3] = np.where(v, bb[..., 3], -big).max(-1)
    bm[..., 4] = 0.5  # flat zmin
    data = np.zeros((I, raster_pallas._R_TOTAL, T), np.float32)
    return raster_pallas.PackedTris(
        tri_data=jnp.asarray(data),
        tri_cols=jnp.asarray(cols),
        batch_meta=jnp.asarray(bm),
    )


def test_sub_rounds_match_numpy_counts():
    # one instance, 256 tris with random bboxes over a 256x128 screen
    rng = np.random.default_rng(3)
    I, T, K = 4, 256, 16
    bb = np.zeros((I, T, 4), np.float32)
    x0 = rng.uniform(0, 250, (I, T))
    y0 = rng.uniform(0, 124, (I, T))
    bb[..., 0] = x0
    bb[..., 1] = y0
    bb[..., 2] = x0 + rng.uniform(0, 12, (I, T))
    bb[..., 3] = y0 + rng.uniform(0, 12, (I, T))
    valid = rng.random((I, T)) < 0.7
    inst_bbox = np.asarray(
        [[0, 0, 255, 127]] * I, np.float32
    )
    usable = np.asarray([True, True, False, True])

    packed = _packed_from_bboxes(I, T, bb, valid)
    work = raster_pallas.build_work_list(
        jnp.asarray(inst_bbox), jnp.asarray(usable), 256, 128,
        tile=128, tris_per_inst=T, max_work=16, packed=packed,
        sub_h=8, compact_k=K,
    )
    meta = np.asarray(work.meta)
    rounds = np.asarray(work.sub_rounds)  # (16, W)
    n = int(work.num_items)

    checked = 0
    for w in range(n):
        if meta[5, w] != 1:
            assert np.all(rounds[:, w] == 0)
            continue
        inst = meta[1, w]
        tx0 = meta[7, w] * 128
        ty0 = meta[6, w] * 128
        xh = (bb[inst, :, 0] <= tx0 + 127) & (bb[inst, :, 2] >= tx0) \
            & valid[inst]
        for s in range(16):
            sy0, sy1 = ty0 + s * 8, ty0 + s * 8 + 7
            c = int((xh & (bb[inst, :, 1] <= sy1)
                     & (bb[inst, :, 3] >= sy0)).sum())
            assert rounds[s, w] == -(-c // K), (w, s)
            checked += 1
    assert checked > 16


def test_dummy_and_padding_items_have_zero_rounds_and_zmin():
    I, T = 1, 256
    bb = np.zeros((I, T, 4), np.float32)
    bb[..., 2] = 50.0
    bb[..., 3] = 50.0
    valid = np.ones((I, T), bool)
    packed = _packed_from_bboxes(I, T, bb, valid)
    work = raster_pallas.build_work_list(
        jnp.asarray(np.asarray([[0, 0, 50, 50]], np.float32)),
        jnp.asarray([True]), 128, 128,
        tile=128, tris_per_inst=T, max_work=8, packed=packed,
    )
    meta = np.asarray(work.meta)
    rounds = np.asarray(work.sub_rounds)
    saw_valid = False
    for k in range(8):
        if meta[5, k] == 0:  # dummy / padding
            assert np.all(rounds[:, k] == 0)
        else:
            saw_valid = True
            # rows 0..50 -> subtiles 0..6 have work, 7.. none
            assert np.all(rounds[0:7, k] > 0)
            assert np.all(rounds[7:, k] == 0)
            # zmin 0.5 floor-quantized at 2^20
            assert meta[8, k] == int(0.5 * (1 << 20))
    assert saw_valid
