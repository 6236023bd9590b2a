#!/bin/bash
# Sequential TPU validation/bench chain for the round-2 perf changes.
# Run when the tunnel is healthy; each step is independently supervised
# (bench.py self-supervises; perf scripts run under tpu_run.sh).
set -u
cd "$(dirname "$0")/.."

echo "=== A: small-shape route parity on hardware ==="
TPU_RUN_TIMEOUT=1200 TPU_RUN_STALL=600 TPU_RUN_INIT_STALL=150 \
  bash scripts/tpu_run.sh scripts/perf_route.py 512 1024 0.01 || true

echo "=== B: bench default (pallas route in context; canary edges=3237298) ==="
BENCH_STALL=600 timeout 2400 python bench.py || true

echo "=== C: bench depth=2 A/B ==="
BENCH_DEPTH=2 BENCH_STALL=600 timeout 2400 python bench.py || true

echo "=== D: full-width route timing ==="
TPU_RUN_TIMEOUT=1800 TPU_RUN_STALL=900 TPU_RUN_INIT_STALL=150 \
  bash scripts/tpu_run.sh scripts/perf_route.py 512 30720 0.002 || true

echo "=== E: unit-weights single-pass kernel on hardware ==="
BENCH_UNIT_WEIGHTS=1 BENCH_LOCI=8192 BENCH_STALL=600 timeout 1800 python bench.py || true

echo "=== chain done ==="
