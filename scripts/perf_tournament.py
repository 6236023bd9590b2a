"""Time the one-dispatch threshold tournament (warm vs steady-state).

Separates persistent-cache deserialization / first-dispatch cost from
the steady device time of ``pairs_quantile_core``, and times the host
``sample_pairs`` draw separately — the e2e `threshold_s` conflates all
three.  Run on the TPU attachment.
"""

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
    from spydrpick_tpu.engine.threshold import (
        determine_mi_threshold, default_mi_values, determine_threshold_pairs,
        sample_pairs)

    S = int(os.environ.get("BENCH_SAMPLES", 3000))
    L = int(os.environ.get("BENCH_LOCI", 30720))

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(S, L)).astype(np.uint8)
    codes[rng.random((S, L)) < 0.05] = 4
    al = Alignment(
        codes=codes,
        sample_names=[f"s{i}" for i in range(S)],
        id_string="bench",
        translation=np.arange(L, dtype=np.int64),
        n_original_positions=L,
        weights=rng.random(S) * 0.9 + 0.1,
    )
    engine = MIEngine(al, EngineConfig(tile=512))

    n_values = default_mi_values(L, 0)
    possible = L * (L - 1) // 2
    pct = 1.0 - n_values / possible
    pairs_n = determine_threshold_pairs(0, possible, pct)
    k = min(int(pct * pairs_n), pairs_n - 1)
    iters = 10

    t0 = time.perf_counter()
    prng = np.random.default_rng(42)
    draws = [sample_pairs(prng, pairs_n, L) for _ in range(iters)]
    t_draw = time.perf_counter() - t0
    ii = np.concatenate([d[0] for d in draws])
    jj = np.concatenate([d[1] for d in draws])

    for rep in range(4):
        t0 = time.perf_counter()
        th = engine.pair_quantiles(ii, jj, iters, pairs_n, k)
        dt = time.perf_counter() - t0
        print(f"pair_quantiles rep {rep}: {dt:.3f}s "
              f"(median {np.median(th):.6f})", flush=True)

    t0 = time.perf_counter()
    thr = determine_mi_threshold(engine, n_values, seed=42)
    t_full = time.perf_counter() - t0
    print(f"sample_pairs draw: {t_draw:.3f}s  pairs_n={pairs_n} k={k}")
    print(f"determine_mi_threshold (steady): {t_full:.3f}s -> {thr:.6f}")


if __name__ == "__main__":
    main()
