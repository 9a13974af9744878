"""Mosaic VPU microprobe: per-pass cost of the raster eval's broadcast
FMA chain. Times N repetitions of

  (K,1)*(1,P) + (K,1)*(1,P) + (K,1)   [the ev() shape, 2 muls 2 adds]

against N repetitions of a single mul and a mul+add, on the production
eval shape (K=32, P=2048). The ratios tell whether Mosaic fuses
mul+add into vector FMAs (ratio ~2:1:1 per-op if not fused, flatter if
fused) — this decides whether restructuring eval to hoist the y-term
(a 3D (K, sub_h, win_w) layout) can actually halve eval passes.
Throwaway measurement tooling.
"""
import os
import sys
import time
import functools

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

K, P = 32, 2048
N = 512  # unrolled reps per kernel call


def make_kernel(mode):
    def kernel(a_ref, b_ref, c_ref, px_ref, py_ref, o_ref):
        a = a_ref[:]          # (K, 1) — but pallas blocks are 2D (K, 128)?
        b = b_ref[:]
        c = c_ref[:]
        px = px_ref[:]        # (1, P)
        py = py_ref[:]
        acc = jnp.zeros((K, P), jnp.float32)
        for i in range(N):
            s = a[:, i % 8:i % 8 + 1]
            t = b[:, i % 8:i % 8 + 1]
            u = c[:, i % 8:i % 8 + 1]
            if mode == "full":      # ev(): a*px + b*py + c
                v = s * px + t * py + u
            elif mode == "fma1":    # one mul + one add
                v = s * px + u
            elif mode == "mul":     # one mul
                v = s * px
            else:                   # baseline: one add
                v = px + u
            acc = acc + v
        o_ref[:] = acc

    return kernel


def run(mode):
    a = jnp.ones((K, 128), jnp.float32) * 1e-7
    px = jnp.linspace(0.0, 1.0, P, dtype=jnp.float32).reshape(1, P)
    f = pl.pallas_call(
        make_kernel(mode),
        out_shape=jax.ShapeDtypeStruct((K, P), jnp.float32),
    )
    g = jax.jit(lambda a, px: f(a, a * 0.5, a * 0.25, px, px * 2.0))

    def chain(n):
        def body(i, carry):
            x, s = carry
            o = g(x, px)
            return (x + o[0, 0] * 1e-30, s + o.mean())
        return jax.jit(lambda x: jax.lax.fori_loop(
            0, n, body, (x, jnp.float32(0.0)))[1])

    f4, f20 = chain(8), chain(40)
    float(f4(a)); float(f20(a))
    t4 = min(_t(lambda: float(f4(a))) for _ in range(5))
    t20 = min(_t(lambda: float(f20(a))) for _ in range(5))
    us = (t20 - t4) / 32 * 1e6
    per_op = us / N * 1000  # ns per rep
    print(f"{mode:6s}: {us:8.2f} us/call  {per_op:7.2f} ns/rep")
    return us


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    for m in ["add", "mul", "fma1", "full"]:
        run(m)
