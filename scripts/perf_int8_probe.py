"""Microbench: int8 vs bf16 MXU matmul through Pallas at the MI-kernel
shapes, interleaved in one process (tunnel-noise methodology).

The crosstable operands are 0/1 one-hots: int8 ops are exact, and the
v5e MXU quotes 2x int8 throughput over bf16 (394.7 vs 197 TOP/s).  This
probe measures whether Mosaic actually reaches that on the kernel's
(bs, bi*5) x (bs, bj*5) contraction.

Usage: python scripts/perf_int8_probe.py [iters]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/spydrpick_jax_cache")

BS, BI, BJ = 768, 128, 128
N = 5
S, TI, TJ = 3072, 512, 512


def _kernel(x_ref, y_ref, o_ref, acc, *, n_k, out_dt):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jax.lax.dot_general(
        x_ref[:], y_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=out_dt,
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc[:]


def make(dt, out_dt, n_passes):
    n_k = S // BS
    grid = (TI // BI, TJ // BJ, n_k)
    kern = functools.partial(_kernel, n_k=n_k, out_dt=out_dt)

    def run(x, y):
        outs = []
        for _ in range(n_passes):
            outs.append(pl.pallas_call(
                kern,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((BS, BI * N), lambda i, j, k: (k, i)),
                    pl.BlockSpec((BS, BJ * N), lambda i, j, k: (k, j)),
                ],
                out_specs=pl.BlockSpec((BI * N, BJ * N), lambda i, j, k: (i, j)),
                out_shape=jax.ShapeDtypeStruct((TI * N, TJ * N), out_dt),
                scratch_shapes=[pltpu.VMEM((BI * N, BJ * N), out_dt)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=96 * 1024 * 1024),
            )(x, y))
        return sum(o.astype(jnp.float32) for o in outs)

    return jax.jit(run)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    print(f"# devices {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    xb = (rng.random((S, TI * N)) < 0.2)
    yb = (rng.random((S, TJ * N)) < 0.2)

    variants = {
        "bf16x1": (make(jnp.bfloat16, jnp.float32, 1), jnp.bfloat16),
        "bf16x2": (make(jnp.bfloat16, jnp.float32, 2), jnp.bfloat16),
        "int8x1": (make(jnp.int8, jnp.int32, 1), jnp.int8),
        "int8x2": (make(jnp.int8, jnp.int32, 2), jnp.int8),
    }
    data = {}
    for name, (fn, dt) in variants.items():
        x = jnp.asarray(xb, dt)
        y = jnp.asarray(yb, dt)
        out = fn(x, y)  # compile + correctness
        exact = xb.astype(np.float64).T @ yb.astype(np.float64)
        n_p = int(name[-1])
        np.testing.assert_allclose(np.asarray(out), n_p * exact, rtol=1e-6)
        data[name] = (fn, x, y)
        print(f"# {name} compiled + exact", flush=True)

    flops = 2 * S * (TI * N) * (TJ * N)
    times = {k: [] for k in variants}
    for it in range(iters):
        for name, (fn, x, y) in data.items():
            t0 = time.perf_counter()
            out = fn(x, y)
            float(out[0, 0])  # force host fetch (axon sync caveat)
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        n_p = int(name[-1])
        best = min(ts)
        print(f"{name}: min {best * 1e3:.3f} ms  "
              f"{n_p * flops / best / 1e12:.1f} TFLOP/s (x{n_p} passes)  "
              f"median {np.median(ts) * 1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
