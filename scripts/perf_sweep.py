"""Integrated row-sweep timing: XLA path vs fused Pallas path.

Usage: python scripts/perf_sweep.py [S] [L] [tile]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from spydrpick_tpu.core.alignment import Alignment
from spydrpick_tpu.engine.solver import EngineConfig, MIEngine


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    print("devices", jax.devices(), flush=True)

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(S, L)).astype(np.uint8)
    codes[rng.random((S, L)) < 0.05] = 4
    al = Alignment(
        codes=codes, sample_names=[str(i) for i in range(S)], id_string="b",
        translation=np.arange(L, dtype=np.int64), n_original_positions=L,
        weights=rng.random(S) * 0.9 + 0.1,
    )
    thr = jnp.asarray(10.0, jnp.float32)

    results = {}
    for mode in ["off", "on"]:
        eng = MIEngine(al, EngineConfig(tile=tile, use_pallas=mode))

        def run(i0):
            out = eng._row_sweep(eng.data, i0=jnp.asarray(i0, jnp.int32), threshold=thr)
            return float(out[6])

        run(0)
        # row 0 (full width) and a mid row
        for r in [0, (L // tile) // 2]:
            t = time.perf_counter()
            for _ in range(3):
                run(r * tile)
            dt = (time.perf_counter() - t) / 3
            results[(mode, r)] = dt
            print(f"pallas={mode:3s} row{r:3d} {dt:.4f}s", flush=True)

        # full sweep wall time + throughput (second run: exclude compile)
        eng.sweep(10.0)
        t = time.perf_counter()
        edges = eng.sweep(10.0)
        dt = time.perf_counter() - t
        pairs = L * (L - 1) / 2
        print(f"pallas={mode:3s} full sweep {dt:.2f}s  "
              f"{pairs / dt / 1e9:.2f} Gpairs/s", flush=True)

    # numeric agreement spot check
    e_off = MIEngine(al, EngineConfig(tile=tile, use_pallas="off"))
    e_on = MIEngine(al, EngineConfig(tile=tile, use_pallas="on"))
    o1 = jax.tree.map(np.asarray, e_off._row_sweep(
        e_off.data, i0=jnp.asarray(0, jnp.int32), threshold=jnp.asarray(0.1, jnp.float32)))
    o2 = jax.tree.map(np.asarray, e_on._row_sweep(
        e_on.data, i0=jnp.asarray(0, jnp.int32), threshold=jnp.asarray(0.1, jnp.float32)))
    print("colmax max |diff|", np.abs(o1[0] - o2[0]).max(), flush=True)
    print("counts", int(o1[6]), int(o2[6]), flush=True)


if __name__ == "__main__":
    main()
