#!/bin/bash
# Round-4 follow-up chain: (1) re-run the weighted fixed14-vs-bf16
# in-process A/B with the band-based flip gate, (2) A/B the strided
# epilogue schedule against the default deferred schedule.
set -u
cd "$(dirname "$0")/.."

echo "=== B2: production A/B — fixed14 (auto) vs bf16 hi/lo, weighted 30k ==="
TPU_RUN_TIMEOUT=2400 TPU_RUN_STALL=900 TPU_RUN_INIT_STALL=150 \
  bash scripts/tpu_run.sh scripts/perf_ab.py 3000 30720 4 int8_mode=off || true

echo "=== H: strided vs deferred epilogue schedule, weighted 30k ==="
TPU_RUN_TIMEOUT=2400 TPU_RUN_STALL=900 TPU_RUN_INIT_STALL=150 \
  bash scripts/tpu_run.sh scripts/perf_ab.py 3000 30720 4 pallas_schedule=strided || true

echo "=== I: strided vs deferred, unit weights (single-pass kernel) ==="
BENCH_UNIT_WEIGHTS=1 TPU_RUN_TIMEOUT=2400 TPU_RUN_STALL=900 TPU_RUN_INIT_STALL=150 \
  bash scripts/tpu_run.sh scripts/perf_ab.py 3000 30720 4 pallas_schedule=strided || true

echo "=== chain done ==="
