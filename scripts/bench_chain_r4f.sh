#!/bin/bash
# Round-4 chain f: re-run the 30k step (chain e's D2 was starved by a
# tunnel-wedge stretch) and refresh the 300k row with the int8 path.
set -u
cd "$(dirname "$0")/.."

echo "=== D3: 30k default (int8 auto, incremental assembly) ==="
BENCH_STALL=600 timeout 4200 python bench.py || true

echo "=== J: 300k (int8 auto, j-windowed + codes-resident) ==="
BENCH_LOCI=299520 BENCH_SWEEPS=3 BENCH_E2E=0 BENCH_STALL=1500 \
  timeout 7200 python bench.py || true

echo "=== chain done ==="
