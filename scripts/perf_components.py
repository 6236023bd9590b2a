"""Microbenchmark of the row-sweep components on the live TPU.

Usage: python scripts/perf_components.py [S] [L] [tile]
One TPU job at a time (the axon tunnel is single-client).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from spydrpick_tpu.core.alignment import Alignment
from spydrpick_tpu.engine.solver import (
    EngineConfig,
    MIEngine,
    row_buffers,
    row_masks,
)


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    print("devices", jax.devices(), flush=True)

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(S, L)).astype(np.uint8)
    codes[rng.random((S, L)) < 0.05] = 4
    al = Alignment(
        codes=codes,
        sample_names=[str(i) for i in range(S)],
        id_string="b",
        translation=np.arange(L, dtype=np.int64),
        n_original_positions=L,
        weights=rng.random(S) * 0.9 + 0.1,
    )
    engine = MIEngine(al, EngineConfig(tile=tile, edge_capacity=1 << 19))
    st = engine.statics

    @jax.jit
    def A(data, i0):  # buffers only
        mi_buf, wog_buf = row_buffers(data, st, i0)
        return mi_buf.sum() + wog_buf.sum()

    @jax.jit
    def B(data, i0):  # + masks + colmax
        mi_buf, wog_buf = row_buffers(data, st, i0)
        sb, cm = row_masks(data, st, i0)
        m = jnp.where(cm, mi_buf, -jnp.inf)
        return m.max(1).sum() + m.max(0).sum() + wog_buf.sum()

    @jax.jit
    def C(data, i0, thr):  # + cumsum (no scatter)
        mi_buf, wog_buf = row_buffers(data, st, i0)
        sb, cm = row_masks(data, st, i0)
        store = sb & (mi_buf > thr)
        pos = jnp.cumsum(store.reshape(-1).astype(jnp.int32))
        m = jnp.where(cm, mi_buf, -jnp.inf)
        return m.max(1).sum() + m.max(0).sum() + pos[-1] + wog_buf.sum()

    i0 = jnp.asarray(0, jnp.int32)
    thr = jnp.asarray(10.0, jnp.float32)

    def t3(f, *a):
        float(f(*a))
        t = time.perf_counter()
        for _ in range(3):
            float(f(*a))
        return (time.perf_counter() - t) / 3

    print(f"A buffers       {t3(A, engine.data, i0):.4f}s", flush=True)
    print(f"B +masks/colmax {t3(B, engine.data, i0):.4f}s", flush=True)
    print(f"C +cumsum       {t3(C, engine.data, i0, thr):.4f}s", flush=True)

    def full(i0v):
        out = engine._row_sweep(
            engine.data, i0=jnp.asarray(i0v, jnp.int32), threshold=thr
        )
        return float(out[6])

    full(0)
    t = time.perf_counter()
    for _ in range(3):
        full(0)
    print(f"D full sweep    {(time.perf_counter() - t) / 3:.4f}s", flush=True)

    @jax.jit
    def E(x):
        return x + 1

    float(E(jnp.float32(1)))
    t = time.perf_counter()
    for _ in range(20):
        float(E(jnp.float32(1)))
    print(f"E dispatch RTT  {(time.perf_counter() - t) / 20:.4f}s", flush=True)


if __name__ == "__main__":
    main()
