"""Dump the raster kernel's Mosaic (input) MLIR and count hot-loop
vector ops — ground truth for what each compaction round actually costs
on the VPU, instead of hand-estimating from the jnp source. Lowering is
local (no remote compile); run with the axon TPU visible so the pallas
TPU lowering path is used. Throwaway measurement tooling."""
import os
import sys
import collections
import re

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.kexp import build_setup, build_work
from vrenderer_tpu.ops import raster_pallas as rp


def main():
    cfg, packed, bbox, usable, dist = build_setup(0)
    packed2, work = build_work(cfg, packed, bbox, usable, dist, 32, 16)

    def call(splits):
        p = rp.PackedTris(splits, packed.tri_cols, packed.batch_meta)
        z, idb, attrs, _ = rp.rasterize_pallas(
            p, work, 1920, 1152, tile=cfg.raster.tile_w,
            sub_h=16, compact_k=32, max_work=2048,
            win_w=128)
        return z

    lowered = jax.jit(call).lower(packed.tri_data)
    txt = lowered.as_text()
    # the Mosaic module rides inside tpu_custom_call's backend config
    out = "/tmp/mosaic_dump.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out}")
    # crude op census of the whole module
    ops = collections.Counter(
        m.group(1) for m in re.finditer(r"= \"?([a-z_]+\.[a-z_0-9]+)", txt)
    )
    for k, v in ops.most_common(40):
        print(f"{v:6d}  {k}")


if __name__ == "__main__":
    main()
