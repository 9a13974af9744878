"""Round-count statistics for x-windowed compaction candidates.

For window widths dividing the 128-px supertile, computes the exact
per-(item, subtile-row, x-window) compaction round counts the windowed
kernel would run, vs the current per-(item, subtile-row) counts — the
duplication factor (triangles straddling window boundaries join several
windows) decides whether shrinking the eval sweep from P=sub_h*128 to
P=sub_h*win pays. Throwaway measurement tooling.

Usage: JAX_PLATFORMS=cpu python scripts/winstat.py [cam=0] [sub=16] [k=32]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

from kexp import build_setup, build_work  # noqa: E402

WIDTH, HEIGHT = 1920, 1152


def main():
    cam_idx, sub_h, K = 0, 16, 32
    for a in sys.argv[1:]:
        if a.startswith("cam="):
            cam_idx = int(a[4:])
        elif a.startswith("sub="):
            sub_h = int(a[4:])
        elif a.startswith("k="):
            K = int(a[2:])
    cfg, packed, bbox, usable, dist = build_setup(cam_idx)
    _, work = build_work(cfg, packed, bbox, usable, dist, K, sub_h)
    meta = np.asarray(work.meta)
    cols = np.asarray(packed.tri_cols)   # (I, 8, T)
    tile = cfg.raster.tile_w
    tiles_x = -(-WIDTH // tile)
    n_sub = tile // sub_h

    valid = meta[5] == 1
    w_inst = meta[1][valid]
    w_tx = meta[7][valid] * tile
    w_ty = meta[6][valid] * tile

    x0 = cols[w_inst, 0]
    y0 = cols[w_inst, 1]
    x1 = cols[w_inst, 2]
    y1 = cols[w_inst, 3]
    ok = cols[w_inst, 4] > 0
    wbb = np.maximum(x1 - x0 + 1, 0)
    print(f"tri bbox width: mean {wbb[ok].mean():.1f} px, "
          f"median {np.median(wbb[ok]):.1f}, p90 {np.percentile(wbb[ok], 90):.1f}")

    base_rounds = np.asarray(work.sub_rounds)[:, valid].sum()
    print(f"current: rounds {base_rounds} (rows {base_rounds * K})")

    for win in (64, 32, 16):
        n_win = tile // win
        tot = 0
        for wi in range(n_win):
            wx0 = w_tx + wi * win
            xh = (x0 <= (wx0 + win - 1)[:, None]) & (x1 >= wx0[:, None]) & ok
            for s in range(n_sub):
                sy0 = w_ty + s * sub_h
                m = xh & (y0 <= (sy0 + sub_h - 1)[:, None]) \
                    & (y1 >= sy0[:, None])
                tot += int((-(-m.sum(axis=1) // K)).sum())
        px_rows = tot * K * sub_h * win
        print(f"win={win:3d}: rounds {tot} (x{tot / base_rounds:.2f}), "
              f"eval px {px_rows / 1e6:.0f}M "
              f"(vs {base_rounds * K * sub_h * tile / 1e6:.0f}M, "
              f"x{px_rows / (base_rounds * K * sub_h * tile):.2f})")


if __name__ == "__main__":
    main()
