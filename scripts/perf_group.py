"""Isolate the rows_group_core overhead vs bare row_sweep_core on TPU.

Round-2 mystery: a group dispatch costs ~140-200ms per block-row while
an individually-jitted row_sweep_core costs ~30-80ms. This times
(a) dispatch round-trip, (b) bare rows at several widths, (c) one
group dispatch at several G and store capacities.

Usage: scripts/tpu_run.sh scripts/perf_group.py [S] [L] [tile]
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
from spydrpick_tpu.engine.solver import EngineConfig, MIEngine, _buf_dtype


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 30720
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
    thr = jnp.asarray(0.0067, jnp.float32)
    nl = L // tile

    # dispatch RTT
    @jax.jit
    def E(x):
        return x + 1

    float(E(jnp.float32(1)))
    t = time.perf_counter()
    for _ in range(20):
        float(E(jnp.float32(1)))
    rtt = (time.perf_counter() - t) / 20
    print(f"dispatch RTT {rtt*1e3:.1f}ms", flush=True)

    for cap_pow, G in [(24, 8), (21, 8), (24, 1), (24, 4), (24, 16)]:
        eng = MIEngine(al, EngineConfig(
            tile=tile, store_capacity=1 << cap_pow, rows_per_dispatch=G))
        st = eng.statics
        bd = _buf_dtype(st)
        cap = max(1 << cap_pow, 2 * st.edge_capacity)

        def group_time(first_row):
            rows = [first_row + k * tile for k in range(G)]
            padded = jnp.asarray(rows, jnp.int32)
            colmax_d = jnp.full(st.Lp, -jnp.inf, bd)
            mi_s = jnp.zeros(cap, bd)
            wog_s = jnp.zeros(cap, bd)
            ip_s = jnp.zeros(cap, jnp.int32)
            jp_s = jnp.zeros(cap, jnp.int32)
            off = jnp.asarray(0, jnp.int32)
            tot = jnp.asarray(0, jnp.int32)
            # warm (compile)
            out = eng._rows_group(eng.data, padded, thr, colmax_d, mi_s,
                                  wog_s, ip_s, jp_s, off, tot)
            float(out[7].sum())
            reps = 3
            ts = time.perf_counter()
            for _ in range(reps):
                colmax_d = jnp.full(st.Lp, -jnp.inf, bd)
                mi_s = jnp.zeros(cap, bd)
                wog_s = jnp.zeros(cap, bd)
                ip_s = jnp.zeros(cap, jnp.int32)
                jp_s = jnp.zeros(cap, jnp.int32)
                out = eng._rows_group(eng.data, padded, thr, colmax_d, mi_s,
                                      wog_s, ip_s, jp_s,
                                      jnp.asarray(0, jnp.int32),
                                      jnp.asarray(0, jnp.int32))
                float(out[7].sum())
            return (time.perf_counter() - ts) / reps

        late = (nl - G - 1) * tile
        tg_late = group_time(late)
        tg_0 = group_time(0)
        print(f"cap=2^{cap_pow} G={G:2d}  late group {tg_late*1e3:7.1f}ms "
              f"({tg_late/G*1e3:6.1f}ms/row)   row0 group {tg_0*1e3:7.1f}ms "
              f"({tg_0/G*1e3:6.1f}ms/row)", flush=True)
        del eng


if __name__ == "__main__":
    main()
