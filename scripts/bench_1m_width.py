"""Width validation: a ~1M-column alignment through one chip.

BASELINE.md row 5's shape is S=20k x L=1M (multi-chip HBM class); this
validates the WIDTH machinery alone on one chip by dropping S: codes-
resident storage (~S bytes/column), j-windowed rows (fixed (tile, W)
buffers), epoch-recycled stores.  One sweep at a fixed threshold; the
JSON line records pairs/s and the phase split.

Usage: python scripts/bench_1m_width.py [S] [L] [threshold]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/spydrpick_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from spydrpick_tpu.core.alignment import Alignment
    from spydrpick_tpu.engine.solver import EngineConfig, MIEngine

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 998400
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(S, L)).astype(np.uint8)
    codes[rng.random((S, L)) < 0.05] = 4
    al = Alignment(
        codes=codes,
        sample_names=[f"s{i}" for i in range(S)],
        id_string="width1m",
        translation=np.arange(L, dtype=np.int64),
        n_original_positions=L,
        weights=rng.random(S) * 0.9 + 0.1,
    )
    print("# data built", flush=True)
    engine = MIEngine(al, EngineConfig(onehot_storage="codes",
                                       wog_fetch="outliers"))
    st = engine.statics
    print(f"# statics: Lp={st.Lp} row_window={st.row_window} "
          f"codes={st.onehot_codes} pallas={st.use_pallas} bs={st.pallas_bs}",
          flush=True)
    if thr == 0.0:
        # sampled threshold retaining ~100*L edges (the bench rule)
        ii = rng.integers(0, L, 20000)
        jj = rng.integers(0, L, 20000)
        keep = ii != jj
        sample = engine.pair_mi(np.minimum(ii, jj)[keep],
                                np.maximum(ii, jj)[keep])
        frac = min(1.0, (100 * L) / (L * (L - 1) / 2))
        thr = float(np.quantile(sample, 1 - frac))
    print(f"# threshold {thr:.6f}", flush=True)

    def progress(lo, hi, n, dt):
        if lo % (1 << 16) < 1024:
            print(f"# rows {lo}-{hi} ({n} edges, {dt:.2f}s)", flush=True)

    phases: dict = {}
    t0 = time.perf_counter()
    edges = engine.sweep(thr, progress=progress, timings=phases)
    dt = time.perf_counter() - t0
    pairs = L * (L - 1) / 2
    print(json.dumps({
        "metric": "mi_width_validation_pairs_per_s",
        "value": round(pairs / dt, 1),
        "unit": "column-pairs/s/chip",
        "config": {
            "samples": S, "loci": L, "row_window": st.row_window,
            "threshold": round(thr, 6), "edges": int(edges.n_edges),
            "sweep_seconds": round(dt, 3),
            "phases": {k: (round(v, 3) if isinstance(v, float) else v)
                       for k, v in phases.items()},
        },
    }), flush=True)


if __name__ == "__main__":
    main()
