#!/bin/bash
# Serving-path bench on the real TPU, retrying through claim-unavailable
# windows (the tunneled chip can be held by another tenant for hours; each
# failed claim attempt takes ~25 min). Runs the committed default config
# and the full-batch fused-decode variant; logs under /tmp/bench_r3_*.log
# and touches /tmp/bench_r3_done for chained runs
# (e.g. benchmark/run_goodput_tpu.sh).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache_tpu}
export VOX_BENCH_DEBUG=${VOX_BENCH_DEBUG:-1}

run_until_done() {
  name=$1; shift
  out=/tmp/bench_r3_${name}.log
  while true; do
    echo "=== attempt $name $(date +%H:%M:%S) ===" >> "$out"
    env "$@" timeout 3600 python bench.py >> "$out" 2>&1
    if grep -q '^{"metric"' "$out"; then
      echo "=== $name OK $(date +%H:%M:%S) ===" >> "$out"
      return 0
    fi
    sleep 90
  done
}

# default = fused full-batch decode (VOX_BENCH_FUSED_FULL=1 since r3);
# the A/B variant is the single-step decode baseline (explicit =0)
run_until_done default
run_until_done singlestep VOX_BENCH_FUSED_FULL=0
echo "ALL_BENCHES_DONE $(date)" > /tmp/bench_r3_done
