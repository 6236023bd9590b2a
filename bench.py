"""Benchmark: MI-kernel column-pair throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Config: the BASELINE.md "medium" shape (~3k samples x ~30k filtered
columns).  The metric is column-pairs/s through the full sweep path
(crosstable matmul + both MI variants + colmax + edge compaction).

vs_baseline: the reference repo publishes no numbers (BASELINE.md), so
the denominator is the BASELINE.json north-star floor for a 64-core
AVX2 CPU node running the reference binary, estimated at 3e7
column-pairs/s: the reference's inner loop touches every sample's
state pair per column pair through its block-compressed crosstable
(~S*25-wide SIMD ops per pair, mi.hpp:126-181); at S=3000 that is
~1.5e3 effective FLOP/pair after compression wins, and a 64-core AVX2
node sustains ~5e10 useful FLOP/s on this access pattern.
vs_baseline >= 10 meets the north-star "10x a 64-core CPU node".
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_CPU_PAIRS_PER_S = 3.0e7


def main():
    import jax
    import jax.numpy as jnp

    from spydrpick_tpu.engine.solver import EngineConfig, MIEngine, row_sweep_core
    from tests.conftest import random_alignment

    S = int(os.environ.get("BENCH_SAMPLES", 3000))
    L = int(os.environ.get("BENCH_LOCI", 30720))
    tile = int(os.environ.get("BENCH_TILE", 512))

    rng = np.random.default_rng(0)
    from spydrpick_tpu.core.alignment import Alignment

    codes = rng.integers(0, 4, size=(S, L)).astype(np.uint8)
    gaps = rng.random((S, L)) < 0.05
    codes[gaps] = 4
    al = Alignment(
        codes=codes,
        sample_names=[f"s{i}" for i in range(S)],
        id_string="bench",
        translation=np.arange(L, dtype=np.int64),
        n_original_positions=L,
        weights=rng.random(S) * 0.9 + 0.1,
    )
    engine = MIEngine(al, EngineConfig(tile=tile, edge_capacity=1 << 19))

    thr = jnp.asarray(10.0, jnp.float32)  # store ~nothing: kernel-bound

    def run_row(i0):
        out = engine._row_sweep(engine.data, i0=jnp.asarray(i0, jnp.int32), threshold=thr)
        # force completion with a host fetch: block_until_ready is not a
        # reliable sync on the tunneled TPU platform (measured)
        return float(out[6])

    run_row(0)  # warmup / compile

    # measure a representative set of block-rows (cost varies linearly
    # with row index; sample evenly and scale)
    n_rows = -(-L // tile)
    sample_rows = list(range(0, n_rows, max(1, n_rows // 16)))
    pairs_done = 0
    t0 = time.perf_counter()
    for r in sample_rows:
        i0 = r * tile
        run_row(i0)
        rows_here = min(tile, L - i0)
        # pairs computed in this row: full tiles j >= row r
        cols = L - (i0 // tile) * tile
        pairs_done += rows_here * cols - rows_here * (rows_here + 1) // 2
    dt = time.perf_counter() - t0

    pairs_per_s = pairs_done / dt
    result = {
        "metric": "mi_column_pairs_per_s",
        "value": round(pairs_per_s, 1),
        "unit": "column-pairs/s/chip",
        "vs_baseline": round(pairs_per_s / BASELINE_CPU_PAIRS_PER_S, 3),
        "config": {"samples": S, "loci": L, "tile": tile,
                   "backend": jax.default_backend(),
                   "sampled_rows": len(sample_rows), "seconds": round(dt, 3)},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
