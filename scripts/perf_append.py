"""Isolate the group-step append overhead (+11.6 ms/row at the 30k
config, scripts/perf_phases.py) on the live TPU.

The group step threads four (cap_lines, 128) edge stores through a
fori_loop whose body appends (KL, 128) blocks at a dynamic line offset
inside a lax.cond.  The raw copy is ~8 MB/row (~10 us at HBM rate), so
~12 ms/row means XLA is copying something.  Variants:

  dus       fori_loop body = 4x dynamic_update_slice, no cond
  dus_cond  same, wrapped in lax.cond(i0 >= 0) carrying the stores
  group     the production rows_group_core (reference timing)

Usage: python scripts/perf_append.py [S] [L] [tile]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import functools

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/spydrpick_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spydrpick_tpu.core.alignment import Alignment  # noqa: E402
from spydrpick_tpu.engine.solver import (  # noqa: E402
    EngineConfig,
    MIEngine,
    rows_group_core,
)


def timeit_threaded(fn, state, extra, reps=20):
    """Time fn(state, *extra) -> new state, threading donated buffers."""
    state = fn(state, *extra)
    _ = float(jax.tree.leaves(state)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        state = fn(state, *extra)
    _ = float(jax.tree.leaves(state)[0].reshape(-1)[0])  # host fetch sync
    return (time.perf_counter() - t0) / reps


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 30720
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 512
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
    engine = MIEngine(al, EngineConfig(tile=tile, wog_fetch="outliers"))
    st = engine.statics
    G = 8
    K = st.edge_capacity
    LN = st.store_lanes
    KL = K // LN
    cap_lines = engine._cap_slots // LN
    print(f"# K={K} LN={LN} KL={KL} cap_lines={cap_lines}", flush=True)

    vals = jnp.ones((KL, LN), jnp.float32)
    ip = jnp.ones((KL, LN), jnp.int32)
    stores = (jnp.zeros((cap_lines, LN), jnp.float32),
              jnp.zeros((cap_lines, LN), jnp.float32),
              jnp.zeros((cap_lines, LN), jnp.int32),
              jnp.zeros((cap_lines, LN), jnp.int32))
    rows = jnp.arange(G, dtype=jnp.int32) * tile

    def body_dus(r, carry):
        m, w, i_, j_, off = carry
        off_w = jnp.minimum(off, cap_lines - KL)
        m = jax.lax.dynamic_update_slice(m, vals, (off_w, 0))
        w = jax.lax.dynamic_update_slice(w, vals, (off_w, 0))
        i_ = jax.lax.dynamic_update_slice(i_, ip, (off_w, 0))
        j_ = jax.lax.dynamic_update_slice(j_, ip, (off_w, 0))
        return m, w, i_, j_, off_w + KL // 2

    @functools.partial(jax.jit, donate_argnums=(0,))
    def f_dus(stores, off):
        out = jax.lax.fori_loop(0, G, body_dus, (*stores, off))
        return out[:4]

    def body_cond(r, carry):
        def do(c):
            return body_dus(r, c)

        return jax.lax.cond(rows[r] >= 0, do, lambda c: c, carry)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def f_cond(stores, off):
        out = jax.lax.fori_loop(0, G, body_cond, (*stores, off))
        return out[:4]

    for name, f in (("dus", f_dus), ("dus_cond", f_cond)):
        dt = timeit_threaded(f, stores, (jnp.int32(0),))
        stores = (jnp.zeros((cap_lines, LN), jnp.float32),
                  jnp.zeros((cap_lines, LN), jnp.float32),
                  jnp.zeros((cap_lines, LN), jnp.int32),
                  jnp.zeros((cap_lines, LN), jnp.int32))
        print(f"{name:9s} {dt * 1e3:8.2f} ms/group  "
              f"{dt / G * 1e3:6.2f} ms/row", flush=True)

    # production group step (includes the row sweeps; subtract the
    # perf_phases 'R' per-row number to get the append share)
    colmax = jnp.full(st.Lp, -jnp.inf, jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def g(state, rows, thr):
        cm, m, w, i_, j_, off, tot = state
        out = rows_group_core(engine.data, st, rows, thr, cm,
                              m, w, i_, j_, off, tot)
        return out[:7]

    state = (colmax, *stores, jnp.int32(0), jnp.int32(0))
    dt = timeit_threaded(g, state, (rows, jnp.float32(0.0067)), reps=6)
    print(f"group     {dt * 1e3:8.2f} ms/group  "
          f"{dt / G * 1e3:6.2f} ms/row", flush=True)


if __name__ == "__main__":
    main()
