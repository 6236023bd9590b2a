"""Itemize the sweep's dispatched-compute phases on the live TPU.

Times jitted sub-programs of one block-row at bench scale to show where
compute_s goes: crosstable+entropy buffers, +colmax, +route compaction,
and the full group step with store appends.  One TPU job at a time.

Usage: python scripts/perf_phases.py [S] [L] [tile] [row_frac]
  row_frac: which block-row to time (0.0 = first/most expensive,
  0.5 = median cost).  Prints per-phase seconds and derived MB/s,
  plus a sweep-total projection (sum over all rows of the per-row
  model) for sanity against bench.py's compute_s.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/tmp/spydrpick_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spydrpick_tpu.core.alignment import Alignment
from spydrpick_tpu.engine.solver import (
    EngineConfig,
    MIEngine,
    row_buffers,
    row_masks,
)


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 30720
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    frac = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
    print("# devices", jax.devices(), flush=True)

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
    import os

    engine = MIEngine(al, EngineConfig(
        tile=tile, wog_fetch=os.environ.get("PHASES_WOG", "outliers")))
    st = engine.statics
    print(f"# statics: pallas={st.use_pallas} compaction={st.compaction} "
          f"precision={st.matmul_precision} bs={st.pallas_bs} "
          f"lazy={st.wog_lazy}", flush=True)

    # threshold retaining ~100*L edges (the bench config)
    ii = rng.integers(0, L, 20000)
    jj = rng.integers(0, L, 20000)
    keep = ii != jj
    sample = engine.pair_mi(np.minimum(ii, jj)[keep], np.maximum(ii, jj)[keep])
    target_frac = min(1.0, (100 * L) / (L * (L - 1) / 2))
    threshold = float(np.quantile(sample, 1 - target_frac))
    print(f"# threshold {threshold:.6f}", flush=True)

    @jax.jit
    def A(data, i0):  # crosstable matmuls + entropy only
        mi_buf, wog_buf = row_buffers(data, st, i0)
        out = mi_buf.sum()
        return out if wog_buf is None else out + wog_buf.sum()

    @jax.jit
    def B(data, i0):  # + masks + colmax reductions
        mi_buf, wog_buf = row_buffers(data, st, i0)
        sb, cm = row_masks(data, st, i0)
        m = jnp.where(cm, mi_buf, -jnp.inf)
        out = m.max(1).sum() + m.max(0).sum()
        return out if wog_buf is None else out + wog_buf.sum()

    @jax.jit
    def R(data, i0, thr):  # + route compaction (full row_sweep_core)
        from spydrpick_tpu.engine.solver import row_sweep_core

        out = row_sweep_core(data, st, i0, thr)
        return out[2].sum() + out[6]

    @jax.jit
    def RT(data, i0, thr):  # route alone on precomputed buffers? -> route
        from spydrpick_tpu.ops.compact_route import compact_edges_route

        mi_buf, wog_buf = row_buffers(data, st, i0)
        sb, _ = row_masks(data, st, i0)
        store = sb & (mi_buf > thr)
        vals, wogs, ipos, jpos, count, lines = compact_edges_route(
            mi_buf, wog_buf, store, i0, st.edge_capacity, st.store_lanes
        )
        return vals.sum() + count

    i0 = jnp.asarray(int(frac * (L // tile)) * tile, jnp.int32)
    thr = jnp.asarray(threshold, jnp.float32)

    def t3(f, *a, n=3):
        float(f(*a))
        best = float("inf")
        for _ in range(n):
            t = time.perf_counter()
            float(f(*a))
            best = min(best, time.perf_counter() - t)
        return best

    # fixed per-dispatch overhead (tunnel round trip): subtract from
    # every phase so numbers reflect device time, not transport
    @jax.jit
    def NOP(data, i0):
        return data.weights.sum() + i0

    o = t3(NOP, engine.data, i0, n=5)
    print(f"# dispatch overhead {o:.4f}s (subtracted)", flush=True)

    _t3 = t3
    t3 = lambda f, *a, n=3: max(_t3(f, *a, n=n) - o, 0.0)

    a = t3(A, engine.data, i0)
    b = t3(B, engine.data, i0)
    r = t3(R, engine.data, i0, thr)
    rt = t3(RT, engine.data, i0, thr)
    print(f"A buffers (matmul+entropy) {a:.4f}s", flush=True)
    print(f"B +masks/colmax            {b:.4f}s (colmax {b - a:+.4f})",
          flush=True)
    print(f"RT buffers+route           {rt:.4f}s (route {rt - a:+.4f})",
          flush=True)
    print(f"R  full row_sweep_core     {r:.4f}s", flush=True)

    # full-sweep projection: per-row cost scales with remaining chunks
    n_rows = L // tile
    rows = np.arange(n_rows)
    rel = (n_rows - rows) / n_rows  # triangular buffer fill
    proj = float((r * rel).sum())
    print(f"# projected sweep compute ~{proj:.2f}s over {n_rows} rows",
          flush=True)

    # group step (adds appends + donation)
    G = engine.config.rows_per_dispatch
    import jax as _jax

    bd = jnp.float32
    LN = st.store_lanes
    cap_lines = max(engine.config.store_capacity, 2 * st.edge_capacity) // LN
    colmax_d = jnp.full((st.Lp,), -jnp.inf, bd)
    mi_s = jnp.zeros((cap_lines, LN), bd)
    wog_s = jnp.zeros((cap_lines, LN), bd)
    ip_s = jnp.zeros((cap_lines, LN), jnp.int32)
    jp_s = jnp.zeros((cap_lines, LN), jnp.int32)
    offset = jnp.asarray(0, jnp.int32)
    total = jnp.asarray(0, jnp.int32)
    starts = jnp.asarray([int(i0)] * G, jnp.int32)
    t0 = time.perf_counter()
    out = engine._rows_group(engine.data, starts, thr, colmax_d, mi_s, wog_s,
                             ip_s, jp_s, offset, total)
    float(out[6])
    print(f"# group step (G={G}, compile+run) {time.perf_counter() - t0:.2f}s",
          flush=True)
    (colmax_d, mi_s, wog_s, ip_s, jp_s, offset, total, counts, lines) = out
    t0 = time.perf_counter()
    out = engine._rows_group(engine.data, starts, thr, colmax_d, mi_s, wog_s,
                             ip_s, jp_s, offset, total)
    float(out[6])
    g = time.perf_counter() - t0
    print(f"G group step (G={G})       {g:.4f}s = {g / G:.4f}s/row "
          f"(appends {g / G - r:+.4f})", flush=True)


if __name__ == "__main__":
    main()
