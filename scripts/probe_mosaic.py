"""Probe Mosaic support for the compaction-kernel primitives.

Each probe is a tiny pallas kernel run on the real chip; prints OK/FAIL.
Throwaway measurement tooling.
"""

import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        out = fn()
        out = jax.tree_util.tree_map(np.asarray, out)
        print(f"OK   {name}: {out if np.size(out) < 8 else out.shape}")
        return True
    except Exception as e:
        msg = str(e).split(chr(10))[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return False


def probe_reshape_16x128():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(1, 2048)

    x = jnp.arange(2048, dtype=jnp.float32).reshape(16, 128)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 2048), jnp.float32))(x)
    assert np.array_equal(np.asarray(out)[0], np.arange(2048)), "wrong order"
    return out[0, :3]


def probe_reshape_back():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(16, 128)

    x = jnp.arange(2048, dtype=jnp.float32).reshape(1, 2048)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32))(x)
    assert np.array_equal(np.asarray(out).reshape(-1), np.arange(2048))
    return out[0, :3]


def probe_cumsum_lanes():
    def k(x_ref, o_ref):
        o_ref[:] = jnp.cumsum(x_ref[:], axis=1)

    x = jnp.ones((1, 2048), jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 2048), jnp.float32))(x)
    assert float(out[0, -1]) == 2048.0
    return out[0, :3]


def probe_dot_lane_contract():
    def k(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    a = jnp.ones((64, 128), jnp.float32)
    b = jnp.ones((48, 128), jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((64, 48), jnp.float32))(a, b)
    assert float(out[0, 0]) == 128.0
    return out[0, :2]


def probe_big_onehot_matmul():
    def k(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    a = jnp.zeros((64, 2048), jnp.float32).at[:, 5].set(1.0)
    b = jnp.arange(2048 * 48, dtype=jnp.float32).reshape(2048, 48) / 1e3
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((64, 48), jnp.float32))(a, b)
    assert abs(float(out[0, 0]) - float(b[5, 0])) < 1e-6
    return out[0, :2]


def probe_iota_eq_onehot():
    """one-hot build: rank (1,2048) lane row vs sublane iota (64,1)."""
    def k(r_ref, o_ref):
        kio = jax.lax.broadcasted_iota(jnp.int32, (64, 2048), 0)
        o_ref[:] = (r_ref[:].astype(jnp.int32) == kio).astype(jnp.float32)

    r = jnp.arange(2048, dtype=jnp.float32).reshape(1, 2048) % 64
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((64, 2048), jnp.float32))(r)
    assert float(out[5, 5]) == 1.0 and float(out[5, 6]) == 0.0
    return out[0, :2]


def probe_grid_overhead(n=8192):
    """Per-grid-step cost of a near-trivial kernel with scalar prefetch."""
    def k(meta_ref, x_ref, o_ref):
        w = pl.program_id(0)

        @pl.when(meta_ref[0, w] == 1)
        def _():
            o_ref[:] = x_ref[:] + 1.0

    meta = jnp.zeros((2, n), jnp.int32).at[0, 0].set(1)
    x = jnp.ones((8, 128), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(n,),
        in_specs=[pl.BlockSpec((8, 128), lambda w, m: (0, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda w, m: (0, 0)),
    )
    f = jax.jit(lambda m, xx: pl.pallas_call(
        k, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(m, xx))

    def chain(steps):
        def body(i, c):
            return c + f(meta, x + c[0, 0] * 1e-30)
        return jax.jit(lambda: jax.lax.fori_loop(
            0, steps, body, jnp.zeros((8, 128), jnp.float32))[0, 0])

    c4, c12 = chain(4), chain(12)
    float(c4()); float(c12())
    t4 = min(_t(lambda: float(c4())) for _ in range(3))
    t12 = min(_t(lambda: float(c12())) for _ in range(3))
    per_call = (t12 - t4) / 8
    print(f"     grid {n} steps: {per_call*1e3:.3f} ms/call = "
          f"{per_call/n*1e9:.0f} ns/step")
    return jnp.zeros(())


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    run("reshape (16,128)->(1,2048)", probe_reshape_16x128)
    run("reshape (1,2048)->(16,128)", probe_reshape_back)
    run("cumsum along 2048 lanes", probe_cumsum_lanes)
    run("dot_general contract ((1,),(1,))", probe_dot_lane_contract)
    run("one-hot (64,2048)@(2048,48)", probe_big_onehot_matmul)
    run("iota==rank one-hot build", probe_iota_eq_onehot)
    run("grid-step overhead", probe_grid_overhead)
