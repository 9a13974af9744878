"""Mosaic probe: windowed access patterns for the compaction dot.
Variants: (a) pl.load with ds on lanes, (b) dynamic middle-axis slice of
a (C, T//128, 128) view, (c) same via strided ref indexing. Throwaway."""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, C, K, W = 2048, 48, 32, 512
NL = T // 128   # lane-tile count
WL = W // 128

rng = np.random.default_rng(0)
data = rng.standard_normal((C, T)).astype(np.float32)
starts = np.asarray([0, 128, 640, 1536], np.int32)
oh_np = (np.arange(W)[None, :] // 16 == np.arange(K)[:, None])


def want_for(s):
    return oh_np.astype(np.float32) @ data[:, s:s + W].astype(np.float32).T


def run(kern, d, shape):
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(4,),
            in_specs=[pl.BlockSpec(shape, lambda i, st: (0,) * len(shape))],
            out_specs=pl.BlockSpec((K, C), lambda i, st: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((K, C), jnp.float32),
    )(jnp.asarray(starts), d)


def check(name, fn):
    try:
        out = fn()
        err = np.abs(np.asarray(out) - want_for(1536)).max() / np.abs(
            want_for(1536)).max()
        print(f"{name}: rel err {err:.2e}", flush=True)
    except Exception as e:
        print(f"{name}: FAILED: {str(e)[:200]}", flush=True)


# (a) pl.load with ds on the lane axis
def kern_a(st_ref, d_ref, o_ref):
    i = pl.program_id(0)
    start = st_ref[i]
    win = pl.load(d_ref, (slice(None), pl.ds(start, W)))
    oh = (jax.lax.broadcasted_iota(jnp.int32, (K, W), 1) // 16
          == jax.lax.broadcasted_iota(jnp.int32, (K, W), 0)
          ).astype(jnp.bfloat16)
    o_ref[:] = jax.lax.dot_general(
        oh, win.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


check("a: pl.load lane-ds", lambda: run(kern_a, jnp.asarray(data), (C, T)))

# (b) dynamic slice on a middle axis of (C, NL, 128)
data3 = data.reshape(C, NL, 128)


def kern_b(st_ref, d_ref, o_ref):
    i = pl.program_id(0)
    start = st_ref[i] // 128
    win = d_ref[:, pl.ds(start, WL), :]          # (C, WL, 128)
    win = win.reshape(C, W)
    oh = (jax.lax.broadcasted_iota(jnp.int32, (K, W), 1) // 16
          == jax.lax.broadcasted_iota(jnp.int32, (K, W), 0)
          ).astype(jnp.bfloat16)
    o_ref[:] = jax.lax.dot_general(
        oh, win.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


check("b: middle-axis ds", lambda: run(kern_b, jnp.asarray(data3),
                                       (C, NL, 128)))


# (c) two-dim contraction: oh (K, WL, 128) x d (C, WL, 128), dims ((1,2),(1,2))
def kern_c(st_ref, d_ref, o_ref):
    i = pl.program_id(0)
    start = st_ref[i] // 128
    win = d_ref[:, pl.ds(start, WL), :]          # (C, WL, 128)
    rank4 = (
        jax.lax.broadcasted_iota(jnp.int32, (WL, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (WL, 128), 1)
    ) // 16                                       # fake ranks 0..K-1 by 16s
    oh4 = (
        rank4[None, :, :]
        == jax.lax.broadcasted_iota(jnp.int32, (K, WL, 128), 0)
    ).astype(jnp.bfloat16)
    blk = jax.lax.dot_general(
        oh4, win.astype(jnp.bfloat16), (((1, 2), (1, 2)), ((), ())),
        preferred_element_type=jnp.float32)       # (K, C)
    o_ref[:] = blk


check("c: 2-dim contraction", lambda: run(kern_c, jnp.asarray(data3),
                                          (C, NL, 128)))
