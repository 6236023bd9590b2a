"""A/B the deferred-epilogue (software-pipelined) single MI kernel vs
the serial schedule, slope-timed on the live TPU (one job at a time).

Usage: python scripts/perf_defer_ab.py [S] [tile]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/tmp/spydrpick_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scripts.perf_kernel_anatomy import time_one  # noqa: E402
from spydrpick_tpu.ops.mi_pallas import (  # noqa: E402
    mi_tile_pallas_single,
    split_bf16,
)


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 3072
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    print("# devices", jax.devices(), flush=True)

    rng = np.random.default_rng(0)
    xi = (rng.random((S, T * 5)) < 0.2).astype(np.float32)
    xi *= rng.random((S, 1)).astype(np.float32) + 0.1
    xj = (rng.random((S, T * 5)) < 0.2).astype(np.float32)
    xi_hi, xi_lo = split_bf16(jnp.asarray(xi))
    xj_b = jnp.asarray(xj, jnp.bfloat16)
    ipf = jnp.ones(T * 5, jnp.float32)
    jpf = jnp.ones(T * 5, jnp.float32)
    args = (xi_hi, xi_lo, xj_b, ipf, jpf)

    # correctness on chip first: the two schedules must be bit-identical
    a = mi_tile_pallas_single(*args, bs=768, defer=False)
    b = mi_tile_pallas_single(*args, bs=768, defer=True)
    diff = float(jnp.max(jnp.abs(a - b)))
    print(f"# on-chip max |defer - serial| = {diff}", flush=True)
    assert diff == 0.0, "deferred schedule is not bit-identical on TPU"

    import itertools
    import os

    variants = []
    for bs, defer in itertools.product((768, 1536), (False, True)):
        if S % bs:
            continue
        variants.append((bs, defer))
    reps = int(os.environ.get("AB_REPS", 2))
    times: dict = {v: [] for v in variants}
    for r in range(reps):  # interleave rounds to expose tunnel drift
        for v in variants:
            bs, defer = v
            fn = lambda a_, b_, c_, d_, e_: mi_tile_pallas_single(
                a_, b_, c_, d_, e_, bs=bs, defer=defer)
            times[v].append(time_one(fn, args))
        print(f"# round {r + 1}/{reps} done", flush=True)
    for v in variants:
        bs, defer = v
        ts = times[v]
        print(f"  bs={bs:4d} defer={int(defer)}: "
              + " ".join(f"{t * 1e3:7.3f}" for t in ts)
              + f"  min {min(ts) * 1e3:7.3f} ms/tile", flush=True)


if __name__ == "__main__":
    main()
