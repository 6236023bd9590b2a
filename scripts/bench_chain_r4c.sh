#!/bin/bash
# Round-4 chain c: strided-schedule A/B after the Mosaic multiple_of
# alignment fix (chain b's H/I failed hardware compile on the dynamic
# slab offset).
set -u
cd "$(dirname "$0")/.."

echo "=== H2: strided vs deferred epilogue schedule, weighted 30k ==="
TPU_RUN_TIMEOUT=2400 TPU_RUN_STALL=900 TPU_RUN_INIT_STALL=150 \
  bash scripts/tpu_run.sh scripts/perf_ab.py 3000 30720 4 pallas_schedule=strided || true

echo "=== I2: strided vs deferred, unit weights (single-pass kernel) ==="
BENCH_UNIT_WEIGHTS=1 TPU_RUN_TIMEOUT=2400 TPU_RUN_STALL=900 TPU_RUN_INIT_STALL=150 \
  bash scripts/tpu_run.sh scripts/perf_ab.py 3000 30720 4 pallas_schedule=strided || true

echo "=== chain done ==="
