"""Unit tests for the work list's SMEM range encoding (batch ranges per
item, packed subtile ranges per (item, batch))."""

import jax.numpy as jnp
import numpy as np

from vrenderer_tpu.ops import raster_pallas


def test_ranges_cover_exactly_hit_batches_and_subtiles():
    # one instance spanning x  [100, 300), y [40, 90) -> tiles 0 and 1 of a
    # 256x128 screen
    I = 4
    bbox = np.zeros((I, 4), np.float32)
    bbox[0] = [100, 40, 299, 89]
    usable = np.zeros((I,), bool)
    usable[0] = True

    nb = 4
    bm = np.zeros((I, nb, 8), np.float32)
    # batch 0: y rows 40..47 (subtile 5 only), x within tile 0 only
    bm[0, 0] = [100, 40, 120, 47, 0, 1, 0, 0]
    # batch 1: y rows 60..80, spans tiles 0+1 in x
    bm[0, 1] = [100, 60, 299, 80, 0, 1, 0, 0]
    # batch 2: empty (invalid)
    bm[0, 2] = [3e38, 3e38, -3e38, -3e38, 0, 0, 0, 0]
    # batch 3: only tile 1 in x
    bm[0, 3] = [200, 0, 299, 10, 0, 1, 0, 0]

    work = raster_pallas.build_work_list(
        jnp.asarray(bbox), jnp.asarray(usable), 256, 128,
        tile=128, tris_per_inst=nb * 128, max_work=16,
        batch_meta=jnp.asarray(bm), sub_h=8,
    )
    meta = np.asarray(work.meta)
    sr = np.asarray(work.sub_range)
    n = int(work.num_items)
    # find the real items (valid) for tiles 0 and 1
    items = {int(meta[0, k]): k for k in range(n) if meta[5, k] == 1}
    assert set(items) == {0, 1}

    def unpack(v):
        return v & 31, (v >> 5) & 31

    k0 = items[0]
    assert meta[8, k0] == 0 and meta[9, k0] == 1  # batches 0..1 hit tile 0
    assert unpack(sr[0, k0]) == (5, 5)            # rows 40..47 -> subtile 5
    assert unpack(sr[1, k0]) == (7, 10)           # rows 60..80 -> 7..10
    assert sr[2, k0] < 0                          # skip-encoded

    k1 = items[1]
    assert meta[8, k1] == 1 and meta[9, k1] == 3  # batches 1 and 3 hit
    assert unpack(sr[3, k1]) == (0, 1)            # rows 0..10 -> 0..1
    # batch 2 skipped everywhere
    assert sr[2, k1] < 0


def test_dummy_and_padding_items_have_empty_ranges():
    bbox = np.asarray([[0, 0, 50, 50]], np.float32)
    usable = np.asarray([True])
    bm = np.zeros((1, 2, 8), np.float32)
    bm[0, :] = [0, 0, 50, 50, 0, 1, 0, 0]
    work = raster_pallas.build_work_list(
        jnp.asarray(bbox), jnp.asarray(usable), 128, 128,
        tile=128, tris_per_inst=256, max_work=8,
        batch_meta=jnp.asarray(bm), sub_h=8,
    )
    meta = np.asarray(work.meta)
    for k in range(8):
        if meta[5, k] == 0:  # dummy / padding
            assert meta[8, k] > meta[9, k]  # empty batch range
            assert np.all(np.asarray(work.sub_range)[:, k] < 0)
