#!/bin/bash
# One-shot hardware session for when the axon tunnel returns (round 4).
# Runs, in order: kernel-mode experiments (v12 batched compaction),
# TPU goldens, all five bench modes, and the per-pass tables.
# Usage: bash scripts/hw_session.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/hw_r04}
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

run() {
  name=$1; shift
  echo "== $name ==" | tee -a "$OUT/log.txt"
  timeout 3000 "$@" >"$OUT/$name.txt" 2>&1
  echo "rc=$? $(tail -2 "$OUT/$name.txt" | head -1)" | tee -a "$OUT/log.txt"
}

# 0. tunnel sanity
run probe python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float((jnp.ones((512,512))@jnp.ones((512,512))).sum()))"

# 1. kernel experiments: v12 batched compaction vs per-round, sub 16/8
run kexp_sub16_blk0 python scripts/kexp.py k=32 sub=16 blk=0
run kexp_sub16_blk4 python scripts/kexp.py k=32 sub=16 blk=4
run kexp_sub16_blk8 python scripts/kexp.py k=32 sub=16 blk=8
run kexp_sub8_blk4  python scripts/kexp.py k=32 sub=8 blk=4
run kexp_sub8_blk8  python scripts/kexp.py k=32 sub=8 blk=8

# 2. goldens (hardware bf16 classes; must pass before benching)
run golden python scripts/tpu_golden.py check
run golden_map python scripts/tpu_golden.py check-map

# 3. bench, all five modes (retry/backoff is built into bench.py)
run bench_1080p python bench.py
run bench_4k python bench.py --mode 4k
run bench_map python bench.py --mode map
run bench_ground python bench.py --mode ground
run bench_envelope python bench.py --mode envelope

# 4. per-pass tables (SURVEY 5.1 schema) through the fixed PassTimer
run passes python scripts/passes.py 1080p 4k

echo "session complete; results in $OUT" | tee -a "$OUT/log.txt"
