"""A/B compaction strategies for the row sweep on the live TPU."""

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
    S, L, tile, K = 1000, 8192, 512, 1 << 19
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(S, L)).astype(np.uint8)
    codes[rng.random((S, L)) < 0.05] = 4
    al = Alignment(
        codes=codes, sample_names=[str(i) for i in range(S)], id_string="b",
        translation=np.arange(L, dtype=np.int64), n_original_positions=L,
        weights=rng.random(S) * 0.9 + 0.1,
    )
    eng = MIEngine(al, EngineConfig(tile=tile, edge_capacity=K))
    st = eng.statics

    def common(data, i0, thr):
        mi_buf, wog_buf = row_buffers(data, st, i0)
        sb, cm = row_masks(data, st, i0)
        m = jnp.where(cm, mi_buf, -jnp.inf)
        colsum = m.max(1).sum() + m.max(0).sum()
        store = sb & (mi_buf > thr)
        fm = store.reshape(-1)
        pos = jnp.cumsum(fm.astype(jnp.int32))
        dest = jnp.where(fm, pos - 1, K)
        return mi_buf, wog_buf, colsum, pos, dest

    @jax.jit
    def v1(data, i0, thr):  # 3 scatters, no unique
        mi_buf, wog_buf, colsum, pos, dest = common(data, i0, thr)
        vals = jnp.zeros(K, mi_buf.dtype).at[dest].set(mi_buf.reshape(-1), mode="drop")
        wogs = jnp.zeros(K, mi_buf.dtype).at[dest].set(wog_buf.reshape(-1), mode="drop")
        idxs = jnp.zeros(K, jnp.int32).at[dest].set(
            jnp.arange(tile * st.Lp, dtype=jnp.int32), mode="drop")
        return colsum + vals.sum() + wogs.sum() + idxs.sum() + pos[-1]

    @jax.jit
    def v2(data, i0, thr):  # 1 scatter (no unique) + 2 gathers
        mi_buf, wog_buf, colsum, pos, dest = common(data, i0, thr)
        idxs = jnp.zeros(K, jnp.int32).at[dest].set(
            jnp.arange(tile * st.Lp, dtype=jnp.int32), mode="drop")
        vals = jnp.take(mi_buf.reshape(-1), idxs)
        wogs = jnp.take(wog_buf.reshape(-1), idxs)
        return colsum + vals.sum() + wogs.sum() + idxs.sum() + pos[-1]

    @jax.jit
    def v3(data, i0, thr):  # 1 scatter unique + 2 gathers (current)
        mi_buf, wog_buf, colsum, pos, dest = common(data, i0, thr)
        idxs = jnp.zeros(K, jnp.int32).at[dest].set(
            jnp.arange(tile * st.Lp, dtype=jnp.int32), mode="drop",
            unique_indices=True)
        vals = jnp.take(mi_buf.reshape(-1), idxs)
        wogs = jnp.take(wog_buf.reshape(-1), idxs)
        return colsum + vals.sum() + wogs.sum() + idxs.sum() + pos[-1]

    @jax.jit
    def v4(data, i0, thr):  # no compaction at all (baseline)
        mi_buf, wog_buf, colsum, pos, dest = common(data, i0, thr)
        return colsum + dest.sum() + pos[-1]

    i0 = jnp.asarray(0, jnp.int32)
    thr = jnp.asarray(10.0, jnp.float32)
    for name, f in [("v4 none", v4), ("v1 3xscatter", v1),
                    ("v2 1scatter+2gather", v2), ("v3 unique+gather", v3)]:
        float(f(eng.data, i0, thr))
        t = time.perf_counter()
        for _ in range(3):
            float(f(eng.data, i0, thr))
        print(f"{name:22s} {(time.perf_counter() - t) / 3:.4f}s", flush=True)


if __name__ == "__main__":
    main()
