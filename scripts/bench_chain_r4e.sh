#!/bin/bash
# Round-4 chain e: scale series with the incremental in-sweep drain
# assembly (judge criterion: sweep <= 1.1x compute at 30k/100k/200k).
set -u
cd "$(dirname "$0")/.."

echo "=== D2: 30k default (int8 auto, incremental assembly) ==="
BENCH_STALL=600 timeout 3000 python bench.py || true

echo "=== F2: 100k ==="
BENCH_LOCI=99840 BENCH_STALL=900 timeout 3600 python bench.py || true

echo "=== G2: 200k ==="
BENCH_LOCI=199680 BENCH_STALL=1200 timeout 5400 python bench.py || true

echo "=== chain done ==="
