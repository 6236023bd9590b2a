"""Locate where the fused MI kernel's time goes on the live TPU:
stripped kernel variants (matmul passes only, epilogue without logs,
single vs dual epilogue) timed at bench scale.

Usage: python scripts/perf_kernel_anatomy.py [S] [tile] [bs]
One TPU job at a time (axon tunnel).
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/tmp/spydrpick_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spydrpick_tpu.core.alphabet import N_STATES
from spydrpick_tpu.ops.mi_pallas import (
    _mi_from_block, mi_tile_pallas, mi_tile_pallas_single, split_bf16,
)


def make_variant(mode, bs, bi, bj, pc=0.5):
    """Pallas kernel with the same grid/specs as the production kernel
    but a reduced body: mode in {mm1, mm2, epi-nolog, single, dual}."""

    def kern(xi_hi_ref, xi_lo_ref, xj_ref, ipf_ref, jpf_ref,
             mi_ref, C_scratch, *, n_k):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            C_scratch[:] = jnp.zeros_like(C_scratch)

        contract = lambda a, b: jax.lax.dot_general(
            a, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        C_scratch[:] += contract(xi_hi_ref[:], xj_ref[:])
        if mode != "mm1":
            C_scratch[:] += contract(xi_lo_ref[:], xj_ref[:])

        @pl.when(k == n_k - 1)
        def _():
            C = C_scratch[:]
            if mode in ("mm1", "mm2"):
                # cheapest correct-shape readout of the accumulator
                mi_ref[:] = C[: mi_ref.shape[0], : mi_ref.shape[1]]
            elif mode == "epi-nolog":
                # full epilogue data flow with log -> x (VPU mult)
                import spydrpick_tpu.ops.mi_pallas as mp
                real_ln = mp._ln_pos
                mp._ln_pos = lambda x: x * 1.0000001
                try:
                    mi_ref[:] = _mi_from_block(
                        C, ipf_ref[0, :], jpf_ref[0, :], pc, bi, bj)
                finally:
                    mp._ln_pos = real_ln
            else:
                mi_ref[:] = _mi_from_block(
                    C, ipf_ref[0, :], jpf_ref[0, :], pc, bi, bj)

    def call(xi_hi, xi_lo, xj, ipf, jpf):
        S = xi_hi.shape[0]
        TI = xi_hi.shape[1] // N_STATES
        TJ = xj.shape[1] // N_STATES
        n_k = S // bs
        return pl.pallas_call(
            functools.partial(kern, n_k=n_k),
            grid=(TI // bi, TJ // bj, n_k),
            in_specs=[
                pl.BlockSpec((bs, bi * N_STATES), lambda i, j, k: (k, i)),
                pl.BlockSpec((bs, bi * N_STATES), lambda i, j, k: (k, i)),
                pl.BlockSpec((bs, bj * N_STATES), lambda i, j, k: (k, j)),
                pl.BlockSpec((1, bi * N_STATES), lambda i, j, k: (0, i)),
                pl.BlockSpec((1, bj * N_STATES), lambda i, j, k: (0, j)),
            ],
            out_specs=pl.BlockSpec((bi, bj), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((TI, TJ), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((bi * N_STATES, bj * N_STATES), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=False,
        )(xi_hi, xi_lo, xj, ipf.reshape(1, -1), jpf.reshape(1, -1))

    return call


def _total_time(fn, args, reps):
    @functools.partial(jax.jit, static_argnums=())
    def rep(a, b, c, d, e):
        def body(_, carry):
            acc, a2 = carry
            out = fn(a2, b, c, d, e)
            out0 = out[0] if isinstance(out, tuple) else out
            bump = (out0[0, 0] * 0).astype(a2.dtype)
            return acc + out0[0, 0].astype(jnp.float32), a2 + bump
        out, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0), a))
        return out

    float(rep(*args))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(rep(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def time_one(fn, args, r_lo=10, r_hi=50):
    """Per-tile seconds from a two-point REPS slope: removes the fixed
    per-dispatch cost (tunnel round-trip + host sync), which otherwise
    inflates every per-tile number by overhead/REPS."""
    t_lo = _total_time(fn, args, r_lo)
    t_hi = _total_time(fn, args, r_hi)
    return (t_hi - t_lo) / (r_hi - r_lo)


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 3072
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    bs = int(sys.argv[3]) if len(sys.argv) > 3 else 768
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

    mm_flops = 2 * 2 * S * (T * 5) ** 2  # dual-pass bf16

    import os as _os
    variant_blocks = ((128, 128), (128, 256), (256, 256), (128, 512))
    if _os.environ.get("ANAT_SKIP_VARIANTS"):
        variant_blocks = ()
    for bi, bj in variant_blocks:
        if T % bi or T % bj:
            continue
        print(f"## bi={bi} bj={bj}", flush=True)
        for mode in ("mm1", "mm2", "epi-nolog", "single"):
            try:
                dt = time_one(make_variant(mode, bs, bi, bj), args)
                print(f"  {mode:10s} {dt * 1e3:7.2f} ms/tile"
                      f"  ({mm_flops / dt / 1e12:5.1f} TF/s dual-pass scale)",
                      flush=True)
            except Exception as e:
                print(f"  {mode:10s} FAIL: {str(e)[:110]}", flush=True)

    # production single kernel (the lazy-wog hot path): honest slope-
    # timed (bs, bi, bj) sweep — the original perf_kernel_sweep used
    # flat timing whose fixed dispatch overhead swamped the signal
    print("## production single kernel sweep", flush=True)
    import os
    bs_list = tuple(int(x) for x in os.environ.get(
        "ANAT_BS", "256,384,512,768,1024,1536,3072").split(","))
    for bs_i in bs_list:
        for bi, bj in ((128, 128), (128, 256), (256, 256)):
            if S % bs_i or T % bi or T % bj:
                continue
            try:
                one = lambda a, b, c, d, e: mi_tile_pallas_single(
                    a, b, c, d, e, bs=bs_i, bi=bi, bj=bj)
                dt = time_one(one, args)
                print(f"  bs={bs_i:4d} bi={bi:3d} bj={bj:3d}"
                      f"  {dt * 1e3:7.3f} ms/tile", flush=True)
            except Exception as e:
                print(f"  bs={bs_i:4d} bi={bi:3d} bj={bj:3d}"
                      f"  FAIL: {str(e)[:100]}", flush=True)
    one_d = lambda a, b, c, d, e: mi_tile_pallas(a, b, c, d, e, d, e, bs=bs)
    print(f"  dual(bs={bs})  {time_one(one_d, args) * 1e3:7.3f} ms/tile",
          flush=True)


if __name__ == "__main__":
    main()
