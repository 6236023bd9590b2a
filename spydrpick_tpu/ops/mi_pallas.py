"""Fused Pallas TPU kernel for the MI tile sweep.

Computes, for a (TI, TJ) tile of column pairs, both MI variants
(with / without gap states) directly from the one-hot operands —
the weighted 5x5 crosstables never leave VMEM.  This fuses the two
stages of the reference hot loop (apegrunt crosstable kernel +
``normalize_and_get_mi_row``, include/mi.hpp:108-181) into a single
MXU-resident pipeline.

Design notes (see also ops/mi.py:mi_from_crosstab_flat for the math):

  * grid (TI/BI, TJ/BJ, S/BS); the S axis is the minor grid dimension
    so the (BI*5, BJ*5) crosstable block accumulates in a VMEM scratch
    across consecutive invocations (standard matmul revisiting);
  * the weighted one-hot i-operand is passed as a bf16 (hi, lo) pair:
    ``w ~ hi + lo`` with both products against the 0/1 one-hot exact in
    bf16, so two DEFAULT-precision MXU passes reach ~2^-16 relative
    count accuracy — 3x fewer passes than an f32 HIGHEST dot;
  * **slab operand layout** (round 5): within each BI/BJ-wide column
    block the one-hot is laid out state-major — index ``t*B + c`` for
    state ``t`` of column ``c`` — instead of the interleaved ``c*5 + t``.
    The MXU does not care (same matmul), but every state reduction of
    the entropy epilogue becomes five STATIC 128-lane-aligned slice
    adds (exact f32 VPU) instead of a split-dot against a 0/1 group
    indicator.  This removes ALL epilogue MXU work, the bf16 hi/lo
    splits of the (BI*5, BJ*5) block they required, and the per-block
    indicator build — the round-4 epilogue spent ~320us/tile there
    (ARCHITECTURE.md hardware trace), the largest half of the kernel.
    Use :func:`to_slab` to convert interleaved operands/presence.
  * the entropy stage runs on the final S-step while the crosstable
    block sits in VMEM; the normalisation division folds into the log
    identity ``sum pm*xlogx(A/Z) = (sum pm*A*lnA - lnZ*Z)/Z`` so only
    (BI, BJ) tensors are divided.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spydrpick_tpu.core.alphabet import N_STATES

BI = 128   # i-columns per block
BJ = 128   # j-columns per block
BS = 256   # samples per accumulation step (keeps VMEM demand in budget)


def to_slab(x: jnp.ndarray, bw: int) -> jnp.ndarray:
    """Interleaved minor axis (..., n*5) -> slab layout.

    Interleaved: index ``c*5 + t`` (state t of column c).  Slab: within
    each ``bw``-wide column block, index ``b*5*bw + t*bw + c`` — the
    layout every kernel in this module expects for its one-hot operands
    AND presence vectors (``bw`` = the kernel's BI/BJ for the i/j side).
    Works on any leading shape; used by operand prep and tests."""
    *lead, m = x.shape
    nb = m // (N_STATES * bw)
    assert nb * N_STATES * bw == m, (m, bw)
    return (x.reshape(*lead, nb, bw, N_STATES)
            .swapaxes(-1, -2)
            .reshape(*lead, m))


def _ln_pos(x):
    return jnp.log(jnp.where(x > 0, x, 1.0))


def _sum_jstates(x, bw):
    """(r, bw*5) slab-layout minor axis -> (r, bw): exact f32 adds over
    the five j-state slabs (static lane-aligned slices — no MXU)."""
    return (((x[:, :bw] + x[:, bw:2 * bw])
             + (x[:, 2 * bw:3 * bw] + x[:, 3 * bw:4 * bw]))
            + x[:, 4 * bw:5 * bw])


def _sum_istates(x, bw):
    """(bw*5, m) slab-layout major axis -> (bw, m): exact adds over the
    five i-state slabs (static sublane-aligned row slices)."""
    return (((x[:bw] + x[bw:2 * bw])
             + (x[2 * bw:3 * bw] + x[3 * bw:4 * bw]))
            + x[4 * bw:5 * bw])


def _mi_from_block(C, ipf, jpf, pc, bi=BI, bj=BJ):
    """(bi, bj) MI from a (bi*5, bj*5) SLAB-layout crosstable block.

    C[t*bi + i, u*bj + c] = weighted count of (i-state t at column i,
    j-state u at column c); ipf/jpf are slab-flattened presence vectors.
    Same math as ops/mi.py:mi_from_crosstab_flat (mi.hpp:146-181
    semantics incl. the full-row-sum quirk of mi.hpp:173): every state
    reduction is an exact slab add, the division by Z folds into the
    log identity, and — unlike the round-4 interleaved epilogue — there
    are NO dots and NO bf16 splits here (pure VPU)."""
    f32 = jnp.float32
    ipc = ipf[:, None]
    jrow = jpf[None, :]
    pm = ipc * jrow
    A = C + pc * pm
    lnA = _ln_pos(A)
    G1 = _sum_jstates(_sum_istates(A * lnA * pm, bi), bj)  # sum pm*A*lnA
    B = _sum_jstates(A * jrow, bj)         # (bi*5, bj) masked j-marginal
    # i-conditional uses the FULL row sum over all i-states (mi.hpp:173)
    R = _sum_istates(A, bi)                # (bi, bj*5) unmasked row sums
    lnR = _ln_pos(R)
    RJ = R * jrow
    Gi_ = _sum_jstates(RJ * lnR, bj)
    Si_ = _sum_jstates(RJ, bj)
    Z = _sum_istates(B * ipc, bi)          # (bi, bj)
    lnB = _ln_pos(B)
    Gj_ = _sum_istates(B * lnB * ipc, bi)  # i-marginal entropy numerator

    invZ = 1.0 / jnp.maximum(Z, jnp.finfo(f32).tiny)
    lnZ = _ln_pos(Z)
    jointH = (G1 - lnZ * Z) * invZ
    icondH = (Gi_ - lnZ * Si_) * invZ
    jcondH = (Gj_ - lnZ * Z) * invZ        # S_j == Z (masked sums telescope)
    return jointH - icondH - jcondH


def _kernel(xi_hi_ref, xi_lo_ref, xj_ref, ipf_ref, jpf_ref, ipwf_ref, jpwf_ref,
            mi_ref, wog_ref, C_scratch, *, pc, n_k, bi=BI, bj=BJ,
            mults=(1, 1), acc_scale=1.0):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        C_scratch[:] = jnp.zeros_like(C_scratch)

    _acc_passes(C_scratch, (xi_hi_ref, xi_lo_ref), xj_ref, mults)

    @pl.when(k == n_k - 1)
    def _():
        C = _acc_to_f32(C_scratch[:], acc_scale)
        mi_ref[:] = _mi_from_block(C, ipf_ref[0, :], jpf_ref[0, :], pc, bi, bj)
        wog_ref[:] = _mi_from_block(C, ipwf_ref[0, :], jpwf_ref[0, :], pc,
                                    bi, bj)


def _acc_passes(C_scratch, xi_refs, xj_ref, mults, idx=None):
    """Accumulate the crosstable passes into the scratch (f32 bf16 hi/lo
    OR int32 int8 fixed-point: the accumulator type follows the scratch,
    and each pass's integer dot is scaled by its static place-value
    multiplier — (128, 1) recombines a 14-bit fixed-point weight split,
    (1,) is the exact unit-weight / plain path)."""
    acc_dt = jnp.dtype(C_scratch.dtype)
    contract = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=acc_dt,
    )
    for m, xi_ref in zip(mults, xi_refs):
        d = contract(xi_ref[:], xj_ref[:])
        if m != 1:
            d = d * acc_dt.type(m)
        if idx is None:
            C_scratch[:] += d
        else:
            C_scratch[idx] += d


def _acc_to_f32(C, scale):
    """Scratch accumulator -> f32 crosstable for the entropy epilogue
    (int32 counts < 2^24 convert exactly; ``scale`` undoes the static
    fixed-point quantisation factor)."""
    if C.dtype != jnp.float32:
        C = C.astype(jnp.float32)
    if scale != 1.0:
        C = C * jnp.float32(scale)
    return C


def _kernel_single(*refs, pc, n_k, bi=BI, bj=BJ, n_passes=2,
                   mults=(1, 1), acc_scale=1.0):
    """Single-variant kernel: mi only (the lazy-wog hot path — the
    gaps-excluded variant is recomputed post-hoc for the few stored
    edges that need it, the sparsity the reference exploits via its
    crosstable cache, mi.hpp:466-490).

    ``n_passes=1``: unit-weight mode — the weighted one-hot IS the 0/1
    one-hot, exact in bf16, so the lo-residual operand and pass are
    dropped entirely (half the MXU work and input DMA;
    --no-sample-reweighting runs).

    int8 operands flow through unchanged: the caller supplies an int32
    scratch, each pass's dot accumulates exactly on the MXU int8 path
    (2x bf16 throughput on v5e), ``mults`` recombines fixed-point
    weight digits, and ``acc_scale`` converts back to weight units at
    the epilogue."""
    if n_passes == 2:
        (xi_hi_ref, xi_lo_ref, xj_ref, ipf_ref, jpf_ref,
         mi_ref, C_scratch) = refs
        xi_refs = (xi_hi_ref, xi_lo_ref)
    else:
        xi_hi_ref, xj_ref, ipf_ref, jpf_ref, mi_ref, C_scratch = refs
        xi_refs = (xi_hi_ref,)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        C_scratch[:] = jnp.zeros_like(C_scratch)

    _acc_passes(C_scratch, xi_refs, xj_ref, mults[:n_passes])

    @pl.when(k == n_k - 1)
    def _():
        mi_ref[:] = _mi_from_block(
            _acc_to_f32(C_scratch[:], acc_scale),
            ipf_ref[0, :], jpf_ref[0, :], pc, bi, bj,
        )


def _shifted_maps(nj: int):
    """Index maps for the deferred-epilogue schedule: at a block's first
    S-step the epilogue of the PREVIOUS block runs (its crosstable just
    finished accumulating), so the output window — and the presence
    operands, which only the epilogue reads — must point at the previous
    block there, and at the block itself on its last step (live only for
    the final grid block).  Visits to each window stay contiguous, so
    Pallas write-back semantics hold."""

    def tgt(i, j, k):
        idx = i * nj + j
        return jnp.where(k == 0, jnp.maximum(idx - 1, 0), idx)

    out = lambda i, j, k: (tgt(i, j, k) // nj, tgt(i, j, k) % nj)
    ip = lambda i, j, k: (0, tgt(i, j, k) // nj)
    jp = lambda i, j, k: (0, tgt(i, j, k) % nj)
    return out, ip, jp


def _kernel_single_deferred(*refs, pc, n_k, ni, nj, bi=BI, bj=BJ,
                            n_passes=2, mults=(1, 1), acc_scale=1.0):
    """Software-pipelined twin of :func:`_kernel_single`: block n's
    entropy epilogue (now pure VPU: logs, elementwise, slab adds)
    executes during block n+1's FIRST matmul step instead of serially
    after block n's last — the MXU accumulates the next crosstable while
    the VPU drains the previous one.  Two parity-selected accumulators
    replace the single scratch; the final grid block writes its own
    epilogue on its last step (no successor).  Requires n_k >= 2
    (callers gate)."""
    if n_passes == 2:
        (xi_hi_ref, xi_lo_ref, xj_ref, ipf_ref, jpf_ref,
         mi_ref, C_scratch) = refs
        xi_refs = (xi_hi_ref, xi_lo_ref)
    else:
        xi_hi_ref, xj_ref, ipf_ref, jpf_ref, mi_ref, C_scratch = refs
        xi_refs = (xi_hi_ref,)
    i, j, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    idx = i * nj + j
    p = jax.lax.rem(idx, 2)

    @pl.when(k == 0)
    def _():
        C_scratch[p] = jnp.zeros_like(C_scratch[p])

    _acc_passes(C_scratch, xi_refs, xj_ref, mults[:n_passes], idx=p)

    # deferred epilogue for the previous block (ipf/jpf/mi windows point
    # at it here via _shifted_maps); independent of this step's matmul
    @pl.when((k == 0) & (idx > 0))
    def _():
        mi_ref[:] = _mi_from_block(
            _acc_to_f32(C_scratch[1 - p], acc_scale),
            ipf_ref[0, :], jpf_ref[0, :], pc, bi, bj,
        )

    # the final grid block has no successor: epilogue on its last step
    @pl.when((k == n_k - 1) & (idx == ni * nj - 1))
    def _():
        mi_ref[:] = _mi_from_block(
            _acc_to_f32(C_scratch[p], acc_scale),
            ipf_ref[0, :], jpf_ref[0, :], pc, bi, bj,
        )


def mi_tile_pallas_single(
    xi_hi: jnp.ndarray,
    xi_lo: jnp.ndarray,
    xj: jnp.ndarray,
    ipf: jnp.ndarray,
    jpf: jnp.ndarray,
    pseudocount: float = 0.5,
    interpret: bool | None = None,
    bs: int = BS,
    bi: int = BI,
    bj: int = BJ,
    n_passes: int = 2,
    defer: bool | None = None,
    pass_mults: tuple = (1, 1),
    acc_scale: float = 1.0,
    schedule: str | None = None,
) -> jnp.ndarray:
    """mi (TI, TJ) f32 only — same matmul + epilogue as the dual kernel
    minus the wog pass (bit-identical mi values).

    Operands and presence vectors are SLAB layout (see :func:`to_slab`):
    the output (TI, TJ) is plain column order.

    ``defer`` selects the software-pipelined schedule (epilogue of block
    n overlaps block n+1's matmul; bit-identical results — same
    accumulation and epilogue math, only the schedule moves).  Default:
    on when the S grid has >= 2 steps; SPYDRPICK_PALLAS_DEFER=0 opts
    out.  (The round-4 ``strided`` schedule was removed: it was
    measured performance-neutral, and the slab epilogue removed the
    MXU-in-epilogue contention it targeted.)

    int8 operands select the MXU int8 path (int32 accumulator scratch,
    2x bf16 throughput on v5e): exact 0/1 one-hots for unit weights
    (``pass_mults=(1,)``, bit-identical to the bf16 pass), or a
    fixed-point weight-digit split recombined by ``pass_mults`` with
    the static quantisation undone by ``acc_scale`` at the epilogue."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    S, TI5 = xi_hi.shape
    TJ5 = xj.shape[1]
    TI, TJ = TI5 // N_STATES, TJ5 // N_STATES
    assert S % bs == 0 and TI % bi == 0 and TJ % bj == 0, (S, TI, TJ)
    n_k = S // bs
    ni, nj = TI // bi, TJ // bj
    grid = (ni, nj, n_k)
    if schedule is None:
        import os

        if defer is not None:       # legacy bool arg
            schedule = "defer" if defer else "serial"
        else:
            schedule = os.environ.get("SPYDRPICK_PALLAS_SCHEDULE", "")
            if not schedule:
                schedule = ("defer" if os.environ.get(
                    "SPYDRPICK_PALLAS_DEFER", "1") == "1" else "serial")
    if schedule not in ("serial", "defer"):
        raise ValueError(
            f"unknown pallas schedule {schedule!r} "
            "(expected serial | defer)")
    if n_k < 2:
        schedule = "serial"  # pipelined schedule needs a successor step
    acc_dt = jnp.int32 if xi_hi.dtype == jnp.int8 else jnp.float32
    assert xj.dtype == xi_hi.dtype, (xi_hi.dtype, xj.dtype)

    xi_spec = pl.BlockSpec((bs, bi * N_STATES), lambda i, j, k: (k, i))
    if schedule == "defer":
        kernel = functools.partial(
            _kernel_single_deferred, pc=pseudocount, n_k=n_k, ni=ni, nj=nj,
            bi=bi, bj=bj, n_passes=n_passes,
            mults=pass_mults, acc_scale=acc_scale,
        )
        out_map, ip_map, jp_map = _shifted_maps(nj)
        scratch = pltpu.VMEM((2, bi * N_STATES, bj * N_STATES), acc_dt)
    else:
        kernel = functools.partial(_kernel_single, pc=pseudocount, n_k=n_k,
                                   bi=bi, bj=bj, n_passes=n_passes,
                                   mults=pass_mults, acc_scale=acc_scale)
        out_map = lambda i, j, k: (i, j)
        ip_map = lambda i, j, k: (0, i)
        jp_map = lambda i, j, k: (0, j)
        scratch = pltpu.VMEM((bi * N_STATES, bj * N_STATES), acc_dt)
    in_specs = [xi_spec] * (2 if n_passes == 2 else 1) + [
        pl.BlockSpec((bs, bj * N_STATES), lambda i, j, k: (k, j)),
        pl.BlockSpec((1, bi * N_STATES), ip_map),
        pl.BlockSpec((1, bj * N_STATES), jp_map),
    ]
    args = ((xi_hi, xi_lo) if n_passes == 2 else (xi_hi,)) + (
        xj, ipf.reshape(1, -1), jpf.reshape(1, -1),
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bi, bj), out_map),
        out_shape=jax.ShapeDtypeStruct((TI, TJ), jnp.float32),
        scratch_shapes=[scratch],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def _xtab_kernel(*refs, n_passes, mults):
    """Crosstable-only kernel: the dual-pass matmul of the fused kernel
    accumulating straight into the (bi*5, bj*5) output block (revisited
    across the minor S grid axis) — no entropy epilogue.  int8 operands
    accumulate int32 (the output block's dtype selects the MXU path);
    ``mults`` recombines fixed-point weight digits as in the fused
    kernel (_acc_passes)."""
    if n_passes == 2:
        xi_hi_ref, xi_lo_ref, xj_ref, c_ref = refs
        xi_refs = (xi_hi_ref, xi_lo_ref)
    else:
        xi_hi_ref, xj_ref, c_ref = refs
        xi_refs = (xi_hi_ref,)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        c_ref[:] = jnp.zeros_like(c_ref)

    _acc_passes(c_ref, xi_refs, xj_ref, mults[:n_passes])


def crosstab_tile_pallas(
    xi_hi: jnp.ndarray,
    xi_lo: jnp.ndarray | None,
    xj: jnp.ndarray,
    bs: int = BS,
    bi: int = BI,
    bj: int = BJ,
    interpret: bool | None = None,
    pass_mults: tuple = (1, 1),
) -> jnp.ndarray:
    """(TI*5, TJ*5) weighted crosstable — same matmul passes as the
    fused kernel, materialised so a sample-sharded caller can psum the
    counts over its mesh axis BEFORE the entropy stage (the collective
    sits between this and :func:`mi_epilogue_pallas`).  Slab operands
    in, slab-layout crosstable out.

    bf16 hi/lo operands accumulate f32; int8 operands accumulate int32
    with ``pass_mults`` digit recombination — int32 partials psum
    EXACTLY over the mesh, so the sharded fixed14/unit path stays
    bit-identical to the single-device fused kernel (the caller scales
    by 1/int8_scale after the collective)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    S, TI5 = xi_hi.shape
    TJ5 = xj.shape[1]
    TI, TJ = TI5 // N_STATES, TJ5 // N_STATES
    assert S % bs == 0 and TI % bi == 0 and TJ % bj == 0, (S, TI, TJ, bs)
    n_passes = 1 if xi_lo is None else 2
    acc_dt = jnp.int32 if xi_hi.dtype == jnp.int8 else jnp.float32
    n_k = S // bs
    grid = (TI // bi, TJ // bj, n_k)
    xi_spec = pl.BlockSpec((bs, bi * N_STATES), lambda i, j, k: (k, i))
    in_specs = [xi_spec] * n_passes + [
        pl.BlockSpec((bs, bj * N_STATES), lambda i, j, k: (k, j)),
    ]
    args = ((xi_hi,) if xi_lo is None else (xi_hi, xi_lo)) + (xj,)
    return pl.pallas_call(
        functools.partial(_xtab_kernel, n_passes=n_passes,
                          mults=pass_mults),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bi * N_STATES, bj * N_STATES), lambda i, j, k: (i, j)
        ),
        out_shape=jax.ShapeDtypeStruct((TI5, TJ5), acc_dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def _epilogue_kernel(*refs, pc, bi, bj, dual):
    if dual:
        c_ref, ipf_ref, jpf_ref, ipwf_ref, jpwf_ref, mi_ref, wog_ref = refs
    else:
        c_ref, ipf_ref, jpf_ref, mi_ref = refs
    C = c_ref[:]
    mi_ref[:] = _mi_from_block(C, ipf_ref[0, :], jpf_ref[0, :], pc, bi, bj)
    if dual:
        wog_ref[:] = _mi_from_block(C, ipwf_ref[0, :], jpwf_ref[0, :], pc,
                                    bi, bj)


def mi_epilogue_pallas(
    C: jnp.ndarray,        # (TI*5, TJ*5) f32 (psum-merged) SLAB crosstable
    ipf: jnp.ndarray,      # (TI*5,) f32 slab presence
    jpf: jnp.ndarray,      # (TJ*5,) f32
    ipwf: jnp.ndarray | None = None,   # presence w/o gaps (dual mode)
    jpwf: jnp.ndarray | None = None,
    pseudocount: float = 0.5,
    interpret: bool | None = None,
    bi: int = BI,
    bj: int = BJ,
):
    """Entropy epilogue over a materialised crosstable: mi (TI, TJ), or
    (mi, wog) when the wo-gaps presence masks are given — identical math
    to the fused kernel's final-step epilogue (_mi_from_block)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    TI5, TJ5 = C.shape
    TI, TJ = TI5 // N_STATES, TJ5 // N_STATES
    assert TI % bi == 0 and TJ % bj == 0, (TI, TJ)
    dual = ipwf is not None
    grid = (TI // bi, TJ // bj)
    c_spec = pl.BlockSpec((bi * N_STATES, bj * N_STATES), lambda i, j: (i, j))
    i_spec = pl.BlockSpec((1, bi * N_STATES), lambda i, j: (0, i))
    j_spec = pl.BlockSpec((1, bj * N_STATES), lambda i, j: (0, j))
    in_specs = [c_spec, i_spec, j_spec] + ([i_spec, j_spec] if dual else [])
    out_spec = pl.BlockSpec((bi, bj), lambda i, j: (i, j))
    out_shape = jax.ShapeDtypeStruct((TI, TJ), jnp.float32)
    args = (C, ipf.reshape(1, -1), jpf.reshape(1, -1))
    if dual:
        args += (ipwf.reshape(1, -1), jpwf.reshape(1, -1))
    res = pl.pallas_call(
        functools.partial(_epilogue_kernel, pc=pseudocount, bi=bi, bj=bj,
                          dual=dual),
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec, out_spec] if dual else out_spec,
        out_shape=[out_shape, out_shape] if dual else out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return res


def split_bf16(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """f32 -> (hi, lo) bf16 pair with hi + lo ~ x (residual ~2^-16 rel).

    The barrier stops XLA from cancelling x - f32(bf16(x)) under
    excess-precision rules (which would zero the lo part)."""
    hi = jax.lax.optimization_barrier(x.astype(jnp.bfloat16))
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def mi_tile_pallas(
    xi_hi: jnp.ndarray,   # (S, TI*5) bf16 weighted one-hot, hi part (slab)
    xi_lo: jnp.ndarray,   # (S, TI*5) bf16 residual (slab)
    xj: jnp.ndarray,      # (S, TJ*5) bf16 one-hot (slab)
    ipf: jnp.ndarray,     # (TI*5,) f32 slab presence
    jpf: jnp.ndarray,     # (TJ*5,) f32
    ipwf: jnp.ndarray,    # (TI*5,) f32 slab presence w/o gaps
    jpwf: jnp.ndarray,    # (TJ*5,) f32
    pseudocount: float = 0.5,
    interpret: bool | None = None,
    bs: int = BS,
    bi: int = BI,
    bj: int = BJ,
    pass_mults: tuple = (1, 1),
    acc_scale: float = 1.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(mi, mi_wo_gaps), each (TI, TJ) f32. S and tiles must be multiples
    of (bs, bi, bj) — pad samples with zero rows (exact: zero one-hot
    contributes nothing to the crosstable).  int8 operands select the
    int32-accumulator MXU path (see mi_tile_pallas_single)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    S, TI5 = xi_hi.shape
    TJ5 = xj.shape[1]
    TI, TJ = TI5 // N_STATES, TJ5 // N_STATES
    assert S % bs == 0 and TI % bi == 0 and TJ % bj == 0, (S, TI, TJ)
    n_k = S // bs
    grid = (TI // bi, TJ // bj, n_k)
    acc_dt = jnp.int32 if xi_hi.dtype == jnp.int8 else jnp.float32

    kernel = functools.partial(_kernel, pc=pseudocount, n_k=n_k, bi=bi, bj=bj,
                               mults=pass_mults, acc_scale=acc_scale)
    mi, wog = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bs, bi * N_STATES), lambda i, j, k: (k, i)),
            pl.BlockSpec((bs, bi * N_STATES), lambda i, j, k: (k, i)),
            pl.BlockSpec((bs, bj * N_STATES), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, bi * N_STATES), lambda i, j, k: (0, i)),
            pl.BlockSpec((1, bj * N_STATES), lambda i, j, k: (0, j)),
            pl.BlockSpec((1, bi * N_STATES), lambda i, j, k: (0, i)),
            pl.BlockSpec((1, bj * N_STATES), lambda i, j, k: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((bi, bj), lambda i, j, k: (i, j)),
            pl.BlockSpec((bi, bj), lambda i, j, k: (i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((TI, TJ), jnp.float32),
            jax.ShapeDtypeStruct((TI, TJ), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bi * N_STATES, bj * N_STATES), acc_dt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        xi_hi, xi_lo, xj,
        ipf.reshape(1, -1), jpf.reshape(1, -1),
        ipwf.reshape(1, -1), jpwf.reshape(1, -1),
    )
    return mi, wog
