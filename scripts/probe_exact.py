"""Isolate the hardware z error: split exactness, compaction exactness,
and HIGHEST-precision eval, each against numpy f64/f32. Throwaway."""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vrenderer_tpu.ops.raster_pallas import _split3_bf16

T, K, C = 2048, 32, 48
P = 1024

rng = np.random.default_rng(0)
# realistic coefficient magnitudes: edges O(1), consts O(1e3), z O(1e-3..1)
data = np.concatenate([
    rng.standard_normal((T, 12)).astype(np.float32),
    rng.standard_normal((T, 36)).astype(np.float32) * 1e3,
], axis=1)

# 1. host-side split exactness on this backend
hi, mid, lo = jax.jit(_split3_bf16)(jnp.asarray(data))
hi32 = np.asarray(hi).astype(np.float32)
mid32 = np.asarray(mid).astype(np.float32)
lo32 = np.asarray(lo).astype(np.float32)
recon = (lo32 + mid32) + hi32
err = np.abs(recon - data)
rel = err.max() / np.abs(data).max()
print("1. split recon max abs err:", err.max(), " (0 expected)")
print("   mid/lo all-zero?", (mid32 == 0).all(), (lo32 == 0).all())

# 2. in-kernel compaction: one-hot @ splits, ascending
splits = jnp.stack([jnp.asarray(h) for h in (hi, mid, lo)])  # (3, T, C)
sel = rng.choice(T, K, replace=False)
sel.sort()
oh_np = np.zeros((K, T), np.float32)
oh_np[np.arange(K), sel] = 1.0


def k2(oh_ref, sp_ref, out_ref):
    dims = (((1,), (0,)), ((), ()))
    oh = oh_ref[:].astype(jnp.bfloat16)
    blk = jax.lax.dot_general(oh, sp_ref[2], dims,
                              preferred_element_type=jnp.float32)
    blk = blk + jax.lax.dot_general(oh, sp_ref[1], dims,
                                    preferred_element_type=jnp.float32)
    blk = blk + jax.lax.dot_general(oh, sp_ref[0], dims,
                                    preferred_element_type=jnp.float32)
    out_ref[:] = blk


blk = pl.pallas_call(
    k2, out_shape=jax.ShapeDtypeStruct((K, C), jnp.float32))(
        jnp.asarray(oh_np), splits)
blk_np = np.asarray(blk)
want = data[sel]
err2 = np.abs(blk_np - want)
print("2. compaction max abs err:", err2.max(), " (0 expected)")

# 3. in-kernel HIGHEST matmul vs numpy f64->f32
rhs = rng.standard_normal((C, 4 * P)).astype(np.float32)


def k3(a_ref, b_ref, out_ref):
    out_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


ev = pl.pallas_call(
    k3, out_shape=jax.ShapeDtypeStruct((K, 4 * P), jnp.float32))(
        jnp.asarray(want), jnp.asarray(rhs))
ev_np = np.asarray(ev)
want3 = (want.astype(np.float64) @ rhs.astype(np.float64)).astype(np.float32)
err3 = np.abs(ev_np - want3)
rel3 = err3 / np.maximum(np.abs(want3), 1e-6)
print("3. HIGHEST eval max rel err:", rel3.max(),
      " (~1e-6 expected, 4e-3 means bf16)")
print("backend:", jax.devices()[0].platform)

# 4. split-term eval: three DEFAULT matmuls from bf16 partials, ascending
def k4(sp_ref, oh_ref, b_ref, out_ref):
    dims = (((1,), (0,)), ((), ()))
    oh = oh_ref[:].astype(jnp.bfloat16)
    parts = []
    for i in (2, 1, 0):
        parts.append(jax.lax.dot_general(
            oh, sp_ref[i], dims, preferred_element_type=jnp.float32))
    ev = None
    for p_ in parts:
        e = jax.lax.dot_general(p_, b_ref[:], dims,
                                preferred_element_type=jnp.float32)
        ev = e if ev is None else ev + e
    out_ref[:] = ev


ev4 = pl.pallas_call(
    k4, out_shape=jax.ShapeDtypeStruct((K, 4 * P), jnp.float32))(
        splits, jnp.asarray(oh_np), jnp.asarray(rhs))
err4 = np.abs(np.asarray(ev4) - want3)
rel4 = err4 / np.maximum(np.abs(want3), 1e-6)
print("4. split-term eval max rel err:", rel4.max())

# 5. same but rhs holding only bf16-exact values (the real rhs_rel case)
rhs_b = rhs.astype(jnp.bfloat16).astype(np.float32)
want5 = (data[sel].astype(np.float64) @ rhs_b.astype(np.float64)
         ).astype(np.float32)
ev5 = pl.pallas_call(
    k4, out_shape=jax.ShapeDtypeStruct((K, 4 * P), jnp.float32))(
        splits, jnp.asarray(oh_np), jnp.asarray(rhs_b))
err5 = np.abs(np.asarray(ev5) - want5)
rel5 = err5 / np.maximum(np.abs(want5), 1e-6)
print("5. split-term eval (bf16-exact rhs) max rel err:", rel5.max())

# 6. realistic rhs_rel structure: block-diag, e = a*dx + b*dy, a,b ~ O(1)
rhs_real = np.zeros((C, 4 * P), np.float32)
dx = (np.arange(P) % 128 + 0.5).astype(np.float32)
dy = (np.arange(P) // 128 + 0.5).astype(np.float32)
for q in range(4):
    rhs_real[3 * q, q * P:(q + 1) * P] = dx
    rhs_real[3 * q + 1, q * P:(q + 1) * P] = dy
data_e = np.zeros((T, C), np.float32)
data_e[:, :12] = rng.standard_normal((T, 12)).astype(np.float32)
he, me_, le = jax.jit(_split3_bf16)(jnp.asarray(data_e))
splits_e = jnp.stack([jnp.asarray(x) for x in (he, me_, le)])
want6 = (data_e[sel].astype(np.float64) @ rhs_real.astype(np.float64)
         ).astype(np.float32)

ev6h = pl.pallas_call(
    k3, out_shape=jax.ShapeDtypeStruct((K, 4 * P), jnp.float32))(
        jnp.asarray(data_e[sel]), jnp.asarray(rhs_real))
e6h = np.abs(np.asarray(ev6h) - want6)
r6h = e6h / np.maximum(np.abs(want6), 1e-3)
print("6a. HIGHEST, realistic rhs: max rel err:", r6h.max())

ev6s = pl.pallas_call(
    k4, out_shape=jax.ShapeDtypeStruct((K, 4 * P), jnp.float32))(
        splits_e, jnp.asarray(oh_np), jnp.asarray(rhs_real))
e6s = np.abs(np.asarray(ev6s) - want6)
r6s = e6s / np.maximum(np.abs(want6), 1e-3)
print("6b. split-term, realistic rhs: max rel err:", r6s.max())
