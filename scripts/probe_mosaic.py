"""Mosaic feature probe for the compaction kernel primitives.

Checks, on the real TPU, that the new raster kernel's building blocks
compile and produce correct values:
  1. jnp.cumsum(f32, axis=-1) on a (16, 2048) block inside a kernel
  2. bool -> bf16 cast of a (K, T) compare (one-hot build)
  3. bf16 x bf16 dot_general with f32 preferred type (compaction matmul)
  4. (1, T) vs (K, T) broadcast compare
  5. SMEM-scalar-driven fori_loop round structure
Throwaway tooling.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 2048
K = 32
N_SUB = 16
C = 48


def _lane_cumsum(x):
    """Inclusive prefix sum along the last (lane) axis: log2(n) shifted
    adds (Mosaic has no cumsum lowering)."""
    n = x.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    sh = 1
    while sh < n:
        shifted = pltpu.roll(x, sh, axis=x.ndim - 1)
        x = x + jnp.where(col >= sh, shifted, 0.0)
        sh *= 2
    return x


def kernel(mask_ref, data_ref, out_ref, ranks):
    mf = mask_ref[:]                                   # (N_SUB, T) f32
    csum = _lane_cumsum(mf)
    ranks[:] = jnp.where(mf > 0.0, csum - 1.0, -1.0)

    rank_s = ranks[pl.ds(3, 1), :]                     # (1, T)
    r = jnp.int32(1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (K, T), 0).astype(
        jnp.float32
    ) + (r * K).astype(jnp.float32)
    oh = (rank_s == slot).astype(jnp.bfloat16)         # (K, T)
    blk = jax.lax.dot_general(
        oh, data_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                  # (K, C)
    out_ref[:] = blk


@jax.jit
def run(mask, data):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K, C), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((N_SUB, T), jnp.float32)],
    )(mask, data)


def main():
    rng = np.random.default_rng(0)
    mask = (rng.random((N_SUB, T)) < 0.05).astype(np.float32)
    data = rng.standard_normal((T, C)).astype(np.float32)
    data_b = data.astype(jnp.bfloat16).astype(np.float32)

    out = np.asarray(run(jnp.asarray(mask), jnp.asarray(data_b)))

    # reference: row s=3, ranks in [K, 2K) select the 33rd..64th set tris
    hits = np.nonzero(mask[3] > 0)[0]
    want = np.zeros((K, C), np.float32)
    for k in range(K):
        j = K + k
        if j < len(hits):
            want[k] = data_b[hits[j]]
    err = np.abs(out - want).max()
    print("platform:", jax.devices()[0].platform)
    print("max |err| vs reference:", err)
    assert err == 0.0, "compaction probe mismatch"
    print("PROBE OK")


if __name__ == "__main__":
    main()
