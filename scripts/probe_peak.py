"""Hardware peak probes for the roofline (VERDICT r4 next #2).

Measures on the real v5e chip:
  1. VPU f32 FMA throughput via a Pallas kernel running R dependent
     elementwise FMA sweeps over a VMEM-resident (S, 1024) f32 block —
     the same op mix as the raster kernel's eval sweep (broadcast FMAs,
     mins, compares all issue on the VPU at the same rate).
  2. VPU min/compare throughput (the cover chain's other half).
  3. The exact compaction-dot shape the kernel issues per round:
     oh (K, T) bf16 @ tri_data (C, T) bf16 NT-contracted -> (K, C) f32,
     as a dependent chain — per-dot wall time at K = 32 and 128 rows.
  4. The winner-swap dot shape: (K, 30) x (K, P) -> (30, P).

Timing: chained on-device with two chain lengths (axon RTT cancels),
min over repeats. Throwaway measurement tooling backing
docs/PERFORMANCE.md's "Roofline" section — not part of the library.

Usage: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
    python scripts/probe_peak.py [fma] [cmp] [dots]
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def chain_time(make_chain, n_short=4, n_long=16, reps=3):
    """Per-iteration seconds via two-length chain difference."""
    fs, fl = make_chain(n_short), make_chain(n_long)
    float(fs())
    float(fl())
    ts = min(_t(lambda: float(fs())) for _ in range(reps))
    tl = min(_t(lambda: float(fl())) for _ in range(reps))
    return (tl - ts) / (n_long - n_short)


# ---------------------------------------------------------------- FMA peak
def fma_kernel(x_ref, o_ref, *, reps, op):
    x = x_ref[:]
    a = jnp.float32(1.0000001)
    b = jnp.float32(1e-7)

    def body(i, v):
        if op == "fma":
            return v * a + b          # 2 flops/elem
        elif op == "min":
            return jnp.minimum(v * a, v + b)   # 3 ops/elem
        else:  # cmp-select: the cover chain's op mix
            m = v >= b
            return jnp.where(m, v * a, v + b)  # ~3 ops/elem

    o_ref[:] = jax.lax.fori_loop(0, reps, body, x)


def probe_fma(op="fma", S=512, reps=512):
    x = jnp.ones((S, 1024), jnp.float32) * 0.5
    kernel = functools.partial(fma_kernel, reps=reps, op=op)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, 1024), jnp.float32),
    )

    def make_chain(n):
        def run(x0):
            def body(i, v):
                return call(v) * jnp.float32(1.0)
            return jax.lax.fori_loop(0, n, body, x0).mean()
        return functools.partial(jax.jit(run), x)

    per_call = chain_time(make_chain)
    elems = S * 1024 * reps
    flops = {"fma": 2, "min": 2, "cmp": 2}[op]
    print(f"VPU {op}: {per_call * 1e6:8.1f} us/call, "
          f"{elems / per_call / 1e9:8.1f} G elem-ops/s, "
          f"{elems * flops / per_call / 1e12:6.2f} Tflop/s "
          f"({S}x1024 x {reps} sweeps)")


# ------------------------------------------------------------- dot shapes
def probe_dots():
    T, C, P = 2048, 48, 2048
    ntdims = (((1,), (1,)), ((), ()))
    wdims = (((0,), (0,)), ((), ()))

    def probe(name, make_iter, work_desc):
        def make_chain(n):
            def run(seed):
                def body(i, s):
                    return make_iter(s)
                return jax.lax.fori_loop(0, n, body, seed)
            return functools.partial(jax.jit(run), jnp.float32(0.5))

        per = chain_time(make_chain, 8, 32)
        print(f"{name}: {per * 1e9:9.0f} ns/iter   ({work_desc})")
        return per

    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (C, T), jnp.float32).astype(jnp.bfloat16)
    for K in (32, 128):
        oh0 = (jax.random.uniform(key, (K, T)) < 0.01).astype(jnp.bfloat16)

        def it(s, oh0=oh0, K=K):
            oh = oh0 * (1.0 + s * 1e-30).astype(jnp.bfloat16)
            out = jax.lax.dot_general(
                oh, d, ntdims, preferred_element_type=jnp.float32)
            return s + out[0, 0] * 1e-30

        probe(f"compaction dot K={K} (1 term)", it,
              f"({K},{T})x({C},{T}) NT bf16->f32")

        def it3(s, oh0=oh0, K=K):
            oh = oh0 * (1.0 + s * 1e-30).astype(jnp.bfloat16)
            o1 = jax.lax.dot_general(
                oh, d, ntdims, preferred_element_type=jnp.float32)
            o2 = jax.lax.dot_general(
                oh, d, ntdims, preferred_element_type=jnp.float32)
            o3 = jax.lax.dot_general(
                oh, d, ntdims, preferred_element_type=jnp.float32)
            return s + ((o1 + o2) + o3)[0, 0] * 1e-30

        probe(f"compaction dots K={K} (3 terms)", it3,
              f"3x ({K},{T})x({C},{T}) NT bf16->f32")

    K = 32
    sw = jax.random.normal(key, (K, 30), jnp.float32).astype(jnp.bfloat16)
    ohw0 = (jax.random.uniform(key, (K, P)) < 0.03).astype(jnp.bfloat16)

    def itsw(s):
        ohw = ohw0 * (1.0 + s * 1e-30).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            sw, ohw, wdims, preferred_element_type=jnp.float32)
        return s + out[0, 0] * 1e-30

    probe("swap dot (1 term)", itsw, f"({K},30)x({K},{P}) bf16->f32")


if __name__ == "__main__":
    args = sys.argv[1:] or ["fma", "cmp", "dots"]
    if "fma" in args:
        probe_fma("fma")
    if "cmp" in args:
        probe_fma("cmp")
    if "dots" in args:
        probe_dots()
