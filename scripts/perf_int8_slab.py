"""Slope-time the slab-epilogue kernel's int8 paths (unit single-pass
and fixed14 two-pass) across (bs, bi, bj) on the live TPU.

Usage: python scripts/perf_int8_slab.py [S] [tile]
One TPU job at a time (axon tunnel).
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
    oh = (rng.random((S, T * 5)) < 0.2)
    xi8 = jnp.asarray(oh, jnp.int8)
    w_q = rng.integers(1, 16384, size=S).astype(np.int32)
    xi_a = jnp.asarray(oh * (w_q // 128)[:, None], jnp.int8)
    xi_b = jnp.asarray(oh * (w_q % 128)[:, None], jnp.int8)
    xj8 = jnp.asarray((rng.random((S, T * 5)) < 0.2), jnp.int8)
    ipf = jnp.ones(T * 5, jnp.float32)
    jpf = jnp.ones(T * 5, jnp.float32)

    combos = [(bs, bi, bj)
              for bs in (768, 1536, 3072)
              for bi, bj in ((128, 128), (128, 256), (256, 256))
              if S % bs == 0]
    for bs, bi, bj in combos:
        try:
            unit = lambda a, b, c, d, e: mi_tile_pallas_single(
                a, None, c, d, e, bs=bs, bi=bi, bj=bj, n_passes=1,
                pass_mults=(1,))
            dt_u = time_one(unit, (xi8, xi8, xj8, ipf, jpf))
        except Exception as e:
            dt_u = None
            print(f"  unit bs={bs} bi={bi} bj={bj} FAIL {str(e)[:90]}",
                  flush=True)
        try:
            fx = lambda a, b, c, d, e: mi_tile_pallas_single(
                a, b, c, d, e, bs=bs, bi=bi, bj=bj, n_passes=2,
                pass_mults=(128, 1), acc_scale=1.0 / 16383.0)
            dt_f = time_one(fx, (xi_a, xi_b, xj8, ipf, jpf))
        except Exception as e:
            dt_f = None
            print(f"  fx   bs={bs} bi={bi} bj={bj} FAIL {str(e)[:90]}",
                  flush=True)
        fmt = lambda d: f"{d * 1e3:7.3f}" if d else "   FAIL"
        print(f"  bs={bs:4d} bi={bi:3d} bj={bj:3d}  unit {fmt(dt_u)}  "
              f"fixed14 {fmt(dt_f)}  ms/tile", flush=True)


if __name__ == "__main__":
    main()
