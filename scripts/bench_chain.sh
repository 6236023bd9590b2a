#!/bin/bash
# Sequential TPU validation/bench chain for the round-2 perf changes,
# most-valuable-first (the tunnel may die again mid-chain).  Each step
# is independently supervised (bench.py self-supervises; perf scripts
# run under tpu_run.sh, which port-checks the relay first).
set -u
cd "$(dirname "$0")/.."

echo "=== A: route parity, small shape (quick compile) ==="
TPU_RUN_TIMEOUT=1200 TPU_RUN_STALL=600 TPU_RUN_INIT_STALL=150 \
  bash scripts/tpu_run.sh scripts/perf_route.py 512 1024 0.01 || true

echo "=== B: route parity + timing, full width ==="
TPU_RUN_TIMEOUT=1800 TPU_RUN_STALL=900 TPU_RUN_INIT_STALL=150 \
  bash scripts/tpu_run.sh scripts/perf_route.py 512 30720 0.002 || true

echo "=== C: bench with the VMEM route (canary edges=3237298) ==="
SPYDRPICK_PALLAS_ROUTE=1 BENCH_STALL=600 timeout 2400 python bench.py || true

echo "=== D: + depth-2 counts pipeline ==="
SPYDRPICK_PALLAS_ROUTE=1 BENCH_DEPTH=2 BENCH_STALL=600 timeout 2400 python bench.py || true

echo "=== E: unit-weights single-pass kernel ==="
BENCH_UNIT_WEIGHTS=1 BENCH_LOCI=8192 BENCH_STALL=600 timeout 1800 python bench.py || true

echo "=== F: plain default bench (driver conditions) ==="
BENCH_STALL=600 timeout 2400 python bench.py || true

echo "=== G: j-windowed sweep at 100k (vs 122.3M full-width) ==="
BENCH_LOCI=99840 BENCH_ROW_WINDOW=32768 BENCH_STALL=900 \
  timeout 3600 python bench.py || true

echo "=== H: 200k columns (auto j-window; first run past the old width limit) ==="
BENCH_LOCI=199680 BENCH_STALL=1200 timeout 5400 python bench.py || true

echo "=== chain done ==="
