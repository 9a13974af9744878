"""Does channel-last (H, W, C) cost more than channel-first (C, H, W)
for elementwise image work on TPU? Throwaway probe."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

H, W = 1152, 1920


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
    print(f"{name:34s} {(t12 - t4) / 8 * 1000:8.2f} ms", flush=True)


key = jax.random.PRNGKey(0)
last = jax.random.uniform(key, (H, W, 8), jnp.float32)
first = jnp.moveaxis(last, -1, 0)


def work_last(a):
    b = jnp.sqrt(a * 1.0001 + 0.5) * 0.9
    return b, b.mean()


def work_first(a):
    b = jnp.sqrt(a * 1.0001 + 0.5) * 0.9
    return b, b.mean()


timed("elementwise (H, W, 8)", work_last, last)
timed("elementwise (8, H, W)", work_first, first)


# the actual deferred-lighting-ish pattern: slice channels, combine
def light_last(a):
    alb = a[..., 0:3]
    nrm = a[..., 3:6]
    ndotl = jnp.clip((nrm * alb).sum(-1), 0, 1)
    out = alb * ndotl[..., None] + 0.1
    return a + out.mean() * 1e-30, out.mean()


def light_first(a):
    alb = a[0:3]
    nrm = a[3:6]
    ndotl = jnp.clip((nrm * alb).sum(0), 0, 1)
    out = alb * ndotl[None] + 0.1
    return a + out.mean() * 1e-30, out.mean()


timed("lighting-ish (H, W, 8)", light_last, last)
timed("lighting-ish (8, H, W)", light_first, first)

# transpose cost
def tr(a):
    b = jnp.moveaxis(a, -1, 0) * 1.0001
    return a + b.mean() * 1e-30, b.mean()

timed("moveaxis (H,W,8)->(8,H,W)", tr, last)
