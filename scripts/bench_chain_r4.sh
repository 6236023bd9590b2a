#!/bin/bash
# Round-4 TPU validation/bench chain, most-valuable-first (the tunnel
# may die mid-chain).  Measures the MXU int8 crosstable path and
# re-records the scale series with the adaptive-sweep bench.
set -u
cd "$(dirname "$0")/.."

echo "=== A: raw int8 vs bf16 MXU throughput (interleaved probe) ==="
TPU_RUN_TIMEOUT=1200 TPU_RUN_STALL=600 TPU_RUN_INIT_STALL=150 \
  bash scripts/tpu_run.sh scripts/perf_int8_probe.py 20 || true

echo "=== B: production A/B — fixed14 (auto) vs bf16 hi/lo, weighted 30k ==="
TPU_RUN_TIMEOUT=2400 TPU_RUN_STALL=900 TPU_RUN_INIT_STALL=150 \
  bash scripts/tpu_run.sh scripts/perf_ab.py 3000 30720 4 int8_mode=off || true

echo "=== C: production A/B — unit-weight int8 vs bf16 single pass ==="
BENCH_UNIT_WEIGHTS=1 TPU_RUN_TIMEOUT=2400 TPU_RUN_STALL=900 TPU_RUN_INIT_STALL=150 \
  bash scripts/tpu_run.sh scripts/perf_ab.py 3000 30720 4 int8_mode=off || true

echo "=== D: plain default bench (driver conditions; int8 auto) ==="
BENCH_STALL=600 timeout 3000 python bench.py || true

echo "=== E: bench with int8 forced OFF (same window control) ==="
BENCH_MXU_INT8=off BENCH_STALL=600 timeout 3000 python bench.py || true

echo "=== F: 100k with int8 auto ==="
BENCH_LOCI=99840 BENCH_STALL=900 timeout 3600 python bench.py || true

echo "=== G: 200k with int8 auto ==="
BENCH_LOCI=199680 BENCH_STALL=1200 timeout 5400 python bench.py || true

echo "=== chain done ==="
