"""Isolate the tri_data layout-copy cost: component-major production
feeding a pallas kernel, row-major (transpose at the boundary) vs
component-major blocks consumed NT by the compaction dot. Throwaway."""

import os
import sys
import time
import functools

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I, T, C, K = 1024, 2048, 48, 32
ITEMS = 1024


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def timed(name, fn, arg0):
    def chain(n):
        def body(i, carry):
            a, acc = carry
            a2, s = fn(a)
            return (a2, acc + s)
        return jax.jit(lambda a: jax.lax.fori_loop(
            0, n, body, (a, jnp.float32(0.0)))[1])
    f4, f12 = chain(4), chain(12)
    float(f4(arg0)); float(f12(arg0))
    t4 = min(_t(lambda: float(f4(arg0))) for _ in range(3))
    t12 = min(_t(lambda: float(f12(arg0))) for _ in range(3))
    print(f"{name:40s} {(t12 - t4) / 8 * 1000:8.2f} ms", flush=True)


key = jax.random.PRNGKey(0)
comps = jax.random.uniform(key, (C, I, T), jnp.float32)  # 48 component maps


def kern_rowmajor(d_ref, o_ref, acc_ref):
    # d_ref: (1, T, C) f32; one-hot-ish dot (K, T) @ (T, C)
    i = pl.program_id(0)
    oh = (jax.lax.broadcasted_iota(jnp.int32, (K, T), 1)
          % T // 61 == jax.lax.broadcasted_iota(jnp.int32, (K, T), 0)
          ).astype(jnp.float32)
    blk = jax.lax.dot_general(
        oh, d_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[:] += blk
    @pl.when(i == ITEMS - 1)
    def _():
        o_ref[:] = acc_ref[:]


def kern_compmajor(d_ref, o_ref, acc_ref):
    # d_ref: (1, C, T) f32; NT dot (K, T) x (C, T) contracting lanes
    i = pl.program_id(0)
    oh = (jax.lax.broadcasted_iota(jnp.int32, (K, T), 1)
          % T // 61 == jax.lax.broadcasted_iota(jnp.int32, (K, T), 0)
          ).astype(jnp.float32)
    blk = jax.lax.dot_general(
        oh, d_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (K, C)
    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[:] += blk
    @pl.when(i == ITEMS - 1)
    def _():
        o_ref[:] = acc_ref[:]


def run_row(d):  # d: (I, T, C)
    return pl.pallas_call(
        kern_rowmajor,
        grid=(ITEMS,),
        in_specs=[pl.BlockSpec((1, T, C), lambda i: (i % I, 0, 0))],
        out_specs=pl.BlockSpec((K, C), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((K, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((K, C), jnp.float32)],
    )(d)


def run_comp(d):  # d: (I, C, T)
    return pl.pallas_call(
        kern_compmajor,
        grid=(ITEMS,),
        in_specs=[pl.BlockSpec((1, C, T), lambda i: (i % I, 0, 0))],
        out_specs=pl.BlockSpec((K, C), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((K, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((K, C), jnp.float32)],
    )(d)


# correctness cross-check (tiny slice)
d_row = jnp.moveaxis(comps[:, :2], 0, -1)       # (2, T, C)
d_comp = comps[:, :2].swapaxes(0, 1)            # (2, C, T)
oh_np = (np.arange(T)[None, :] // 61 == np.arange(K)[:, None]).astype(np.float32)
want = oh_np @ np.asarray(comps[:, 0].T)
def k1(d_ref, o_ref):
    oh = (jax.lax.broadcasted_iota(jnp.int32, (K, T), 1)
          % T // 61 == jax.lax.broadcasted_iota(jnp.int32, (K, T), 0)
          ).astype(jnp.float32)
    o_ref[:] = jax.lax.dot_general(
        oh, d_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
try:
    got = pl.pallas_call(
        k1, in_specs=[pl.BlockSpec((1, C, T), lambda: (0, 0, 0))],
        out_specs=pl.BlockSpec((K, C), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((K, C), jnp.float32))(d_comp[:1])
    err = np.abs(np.asarray(got) - want).max()
    print("NT dot correctness err:", err)
except Exception as e:
    print("NT dot FAILED to lower:", str(e)[:300])

# 1. fresh row-major build (the current production pattern) + kernel.
# comps stays a constant jit arg; only a scalar rides the chain, so the
# rebuild happens every iteration without 400MB carries.
def make_fresh(builder, runner):
    def fn(args):
        seed, cc = args
        d = builder(cc * (1.0 + seed * 1e-30))
        out = runner(d)
        s = out.mean() * 1e-6
        return (seed + s * 1e-30, cc), s
    return fn

timed("fresh build row-major + kernel",
      make_fresh(lambda c: jnp.stack([c[j] for j in range(C)], axis=-1),
                 run_row), (jnp.float32(0.0), comps))

timed("fresh build comp-major + NT kernel",
      make_fresh(lambda c: jnp.stack([c[j] for j in range(C)], axis=1),
                 run_comp), (jnp.float32(0.0), comps))

# 3. fixed-input kernels (pure kernel cost)
d_row_full = jnp.stack([comps[j] for j in range(C)], axis=-1)
d_comp_full = jnp.stack([comps[j] for j in range(C)], axis=1)

def fixed_row(d):
    out = run_row(d)
    s = out.mean() * 1e-6
    return d + (s * 1e-30).astype(d.dtype), s

def fixed_comp(d):
    out = run_comp(d)
    s = out.mean() * 1e-6
    return d + (s * 1e-30).astype(d.dtype), s

timed("fixed row-major kernel", fixed_row, d_row_full)
timed("fixed comp-major NT kernel", fixed_comp, d_comp_full)
