"""Mosaic feasibility probes for a transposed raster eval (pixels on
sublanes, K triangles on lanes) — the round-4 kernel candidate from
docs/PERFORMANCE.md. Three unknowns gate the design:

  1. dynamic SUBLANE window read/write (pl.ds with a traced, 8-aligned
     offset) on a tall (P, 128) ref;
  2. (Pw, 1) x (1, K) broadcast FMA + lane min-reduce to (Pw, 1);
  3. (Pw, 1) -> (Pw/128, 128) reshape (sublane -> lane redistribution,
     minor dim 128);
  4. finalize transpose: x-major per-subtile state (tile_w, sub_h) ->
     row-major (sub_h, tile_w) via jnp transpose in-kernel (needed once
     per tile to emit row-major outputs from x-major state; transposes
     are value-preserving, so int ids ride them as bitcast f32).

Probes 1-3 passed exactly on v5e (2026-08-17). Probe 4 is the remaining
gate. Throwaway measurement tooling. Usage (TPU):
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/probe_transposed.py
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, K, PW = 2048, 128, 256


def kernel(x_ref, o_ref):
    pid = pl.program_id(0)
    p0 = pid * PW
    blk = x_ref[pl.ds(p0, PW), :]            # (PW, K) dyn sublane read
    a = blk[:, 0:1]                          # (PW, 1)
    b = x_ref[0:1, :]                        # (1, K)
    e = a * b + blk                          # (PW, K) broadcast FMA
    w = jnp.min(e, axis=1, keepdims=True)    # (PW, 1) lane reduce
    r = w.reshape(PW // 128, 128)            # sublane -> lane reshape
    o_ref[pl.ds(p0 // 128, PW // 128), :] = r  # dyn sublane write


def transpose_kernel(x_ref, o_ref):
    # x (128, 16) x-major -> (16, 128) row-major, the per-subtile
    # finalize relayout of the transposed-eval design
    o_ref[:] = jnp.transpose(x_ref[:], (1, 0))


def main():
    x = jnp.asarray(np.random.default_rng(0).random((P, K), np.float32))
    out = pl.pallas_call(
        kernel,
        grid=(P // PW,),
        in_specs=[pl.BlockSpec((P, K), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((P // 128, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((P // 128, 128), jnp.float32),
    )(x)
    got = np.asarray(out)
    want = np.min(
        np.asarray(x)[:, 0:1] * np.asarray(x)[0:1, :] + np.asarray(x),
        axis=1,
    ).reshape(P // 128, 128)
    err = np.abs(got - want).max()
    print(f"transposed-eval probes 1-3: OK, max err {err:.2e}")
    assert err < 1e-6

    xt = jnp.asarray(np.random.default_rng(1).random((128, 16), np.float32))
    try:
        ot = pl.pallas_call(
            transpose_kernel,
            out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        )(xt)
        terr = np.abs(np.asarray(ot) - np.asarray(xt).T).max()
        print(f"probe 4 (finalize transpose): OK, max err {terr:.2e}")
    except Exception as e:  # noqa: BLE001 — probe: report, don't crash
        print(f"probe 4 (finalize transpose): FAILED — {type(e).__name__}: "
              f"{str(e)[:300]}")


if __name__ == "__main__":
    main()
