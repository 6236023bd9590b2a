"""Sweep the fused MI kernel's block parameters (bs, bi, bj) on the
live TPU at bench scale and report ms/tile + effective bf16 TFLOP/s.

Usage: python scripts/perf_kernel_sweep.py [S] [tile]
One TPU job at a time.  Mosaic compile failures (VMEM/layout) are
caught per-config and reported as FAIL.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/tmp/spydrpick_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spydrpick_tpu.ops.mi_pallas import mi_tile_pallas, split_bf16


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 3072
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    print("# devices", jax.devices(), flush=True)

    rng = np.random.default_rng(0)
    xi = (rng.random((S, T * 5)) < 0.2).astype(np.float32)
    xi *= rng.random((S, 1)).astype(np.float32) + 0.1
    xj = (rng.random((S, T * 5)) < 0.2).astype(np.float32)
    ipf = np.ones(T * 5, np.float32)
    jpf = np.ones(T * 5, np.float32)

    xi_hi, xi_lo = split_bf16(jnp.asarray(xi))
    xj_b = jnp.asarray(xj, jnp.bfloat16)
    ipf_d = jnp.asarray(ipf)
    jpf_d = jnp.asarray(jpf)

    flops = 2 * 2 * S * (T * 5) ** 2  # two bf16 passes

    ref = None
    configs = [
        (256, 128, 128),  # current default
        (384, 128, 128),
        (512, 128, 128),
        (768, 128, 128),
        (1024, 128, 128),
        (256, 128, 256),
        (512, 128, 256),
        (256, 256, 128),
        (512, 256, 128),
        (256, 256, 256),
        (512, 256, 256),
        (512, 128, 512),
        (1536, 128, 128),
    ]
    REPS = 20

    for bs, bi, bj in configs:
        if S % bs or T % bi or T % bj:
            continue
        tag = f"bs={bs:4d} bi={bi:3d} bj={bj:3d}"
        try:
            one = lambda a, b, c, d, e: mi_tile_pallas(
                a, b, c, d, e, d, e, pseudocount=0.5,
                bs=bs, bi=bi, bj=bj)

            @jax.jit
            def rep(a, b, c, d, e):
                # REPS kernel calls inside ONE dispatch, serialised by a
                # data dependency so neither LICM nor overlap hides the
                # kernel cost behind the tunnel's per-dispatch overhead
                def body(_, carry):
                    acc, a2 = carry
                    mi, wog = one(a2, b, c, d, e)
                    bump = (mi[0, 0] * 0).astype(jnp.bfloat16)
                    return acc + mi[0, 0] + wog[0, 0], a2 + bump
                out, _ = jax.lax.fori_loop(0, REPS, body, (jnp.float32(0), a))
                return out

            mi, wog = jax.jit(one)(xi_hi, xi_lo, xj_b, ipf_d, jpf_d)
            float(mi[0, 0])
            if ref is None:
                ref = np.asarray(mi)
            else:
                err = float(np.abs(np.asarray(mi) - ref).max())
                if err > 1e-4:
                    print(f"{tag}  NUMERIC MISMATCH {err:.2e}", flush=True)
                    continue
            float(rep(xi_hi, xi_lo, xj_b, ipf_d, jpf_d))  # compile
            t0 = time.perf_counter()
            float(rep(xi_hi, xi_lo, xj_b, ipf_d, jpf_d))
            dt = (time.perf_counter() - t0) / REPS
            print(f"{tag}  {dt * 1e3:7.2f} ms/tile  "
                  f"{flops / dt / 1e12:6.1f} TF/s", flush=True)
        except Exception as e:
            print(f"{tag}  FAIL: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
