"""Tile-path accuracy + speed per matmul precision, on the live TPU."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from conftest import random_alignment
from spydrpick_tpu.engine.solver import EngineConfig, MIEngine
from spydrpick_tpu.ops.reference import crosstab_pair, mi_single


def main():
    # accuracy: small alignment, compare sweep MI vs f64 oracle
    al = random_alignment(n_samples=80, n_loci=64, seed=7, gap_frac=0.15)
    want = {}
    for i in range(al.n_loci):
        for j in range(i + 1, al.n_loci):
            want[(i, j)] = mi_single(
                crosstab_pair(al.codes[:, i], al.codes[:, j], al.weights),
                al.state_presence[i], al.state_presence[j], 0.5,
            )

    for prec in ["highest", "high", "default"]:
        eng = MIEngine(al, EngineConfig(tile=64, matmul_precision=prec))
        edges = eng.sweep(-1.0)
        err = max(
            abs(m - want[(i, j)])
            for i, j, m in zip(edges.ipos, edges.jpos, edges.mi)
        )
        print(f"{prec:8s} tile max err {err:.3e}", flush=True)

    # speed: bench-size row sweep
    S, L, tile = 1000, 8192, 512
    rng = np.random.default_rng(0)
    from spydrpick_tpu.core.alignment import Alignment

    codes = rng.integers(0, 4, size=(S, L)).astype(np.uint8)
    codes[rng.random((S, L)) < 0.05] = 4
    big = Alignment(
        codes=codes, sample_names=[str(i) for i in range(S)], id_string="b",
        translation=np.arange(L, dtype=np.int64), n_original_positions=L,
        weights=rng.random(S) * 0.9 + 0.1,
    )
    thr = jnp.asarray(10.0, jnp.float32)
    for prec in ["highest", "high", "default"]:
        eng = MIEngine(big, EngineConfig(tile=tile, matmul_precision=prec))

        def run(i0):
            out = eng._row_sweep(eng.data, i0=jnp.asarray(i0, jnp.int32), threshold=thr)
            return float(out[6])

        run(0)
        t = time.perf_counter()
        for _ in range(3):
            run(0)
        print(f"{prec:8s} row0 {(time.perf_counter() - t) / 3:.4f}s", flush=True)


if __name__ == "__main__":
    main()
