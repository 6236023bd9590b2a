"""Decompose the per-block-row FIXED cost of the sweep on the live TPU.

Round-2 finding: group dispatch time = ~1.03s fixed + ~1.25ms per
(512,512) tile-pair at the bench config — the fixed part (~129ms per
block-row) dominates total sweep time.  This script times each stage of
row_sweep_core on a LATE block-row (nearly no matmul work) to find it.

Usage: scripts/tpu_run.sh scripts/perf_fixed.py [S] [L] [tile]
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
    row_sweep_core,
)


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

    for compact_mode in ["on", "off"]:
        eng = MIEngine(al, EngineConfig(tile=tile,
                                        use_pallas_compact=compact_mode))
        st = eng.statics
        print(f"# pallas={st.use_pallas} compact={compact_mode}", flush=True)

        @jax.jit
        def A(data, i0):  # buffers only
            mi_buf, wog_buf = row_buffers(data, st, i0)
            return mi_buf[0, 0] + wog_buf[0, 0]

        @jax.jit
        def B(data, i0):  # buffers + masks + colmax
            mi_buf, wog_buf = row_buffers(data, st, i0)
            sb, cm = row_masks(data, st, i0)
            m = jnp.where(cm, mi_buf, -jnp.inf)
            return m.max(1).sum() + m.max(0).sum() + wog_buf[0, 0]

        @jax.jit
        def C(data, i0, t):  # full row core (adds compaction)
            out = row_sweep_core(data, st, i0, t)
            return out[0].sum() + out[6]

        def t3(f, *a):
            float(f(*a))  # compile + 1 run
            t = time.perf_counter()
            for _ in range(5):
                float(f(*a))
            return (time.perf_counter() - t) / 5

        nl = L // tile  # last block-row index
        for name, row in [("late", (nl - 1) * tile), ("mid", (nl // 2) * tile),
                          ("row0", 0)]:
            i0 = jnp.asarray(row, jnp.int32)
            ta = t3(A, eng.data, i0)
            tb = t3(B, eng.data, i0)
            tc = t3(C, eng.data, i0, thr)
            print(f"{name:5s} i0={row:6d}  buffers={ta*1e3:7.1f}ms  "
                  f"+colmax={(tb-ta)*1e3:7.1f}ms  +compact={(tc-tb)*1e3:7.1f}ms  "
                  f"full={tc*1e3:7.1f}ms", flush=True)
        del eng


if __name__ == "__main__":
    main()
