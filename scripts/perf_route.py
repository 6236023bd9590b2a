"""Hardware parity + timing for the edge-compaction routing paths:
XLA roll/select vs the VMEM-resident Pallas routing kernel.

Usage: python scripts/perf_route.py [T] [W] [density]
One TPU job at a time (axon tunnel).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/tmp/spydrpick_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spydrpick_tpu.ops.compact_route import compact_edges_route


def total_time(fn, args, reps):
    @jax.jit
    def rep(mi, mask):
        def body(_, carry):
            acc, mi2 = carry
            vals, wogs, ipos, jpos, count, lines = fn(mi2, mask)
            bump = vals[0] * 0
            return acc + count, mi2 + bump
        out, _ = jax.lax.fori_loop(0, reps, body, (jnp.int32(0), mi))
        return out

    int(rep(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(rep(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 30720
    density = float(sys.argv[3]) if len(sys.argv) > 3 else 0.002
    K = 1 << 19
    print("# devices", jax.devices(), flush=True)

    rng = np.random.default_rng(0)
    mi = jnp.asarray(rng.random((T, W)).astype(np.float32))
    mask = jnp.asarray(rng.random((T, W)) < density)

    f_x = lambda m, k: compact_edges_route(m, None, k, 0, K, j_offset=64,
                                           pallas_route=False)
    f_p = lambda m, k: compact_edges_route(m, None, k, 0, K, j_offset=64,
                                           pallas_route=True)

    a = jax.jit(f_x)(mi, mask)
    b = jax.jit(f_p)(mi, mask)
    names = ("vals", "wogs", "ipos", "jpos", "count", "lines")
    for x, y, n in zip(a, b, names):
        x, y = np.asarray(x), np.asarray(y)
        if not np.array_equal(x, y):
            print(f"PARITY FAIL: {n} differs "
                  f"({np.sum(x != y)} mismatches)", flush=True)
            return 1
    print(f"# parity OK ({int(a[4])} edges)", flush=True)

    for tag, f in (("xla", f_x), ("pallas", f_p)):
        t10 = total_time(f, (mi, mask), 5)
        t50 = total_time(f, (mi, mask), 25)
        dt = (t50 - t10) / 20
        print(f"{tag:7s} {dt * 1e3:8.2f} ms/row", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
