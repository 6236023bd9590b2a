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
  * the entropy stage runs on the final S-step while the crosstable
    block sits in VMEM: the 5-state group reductions are expressed as
    dots against 0/1 group-indicator matrices (built once per block
    from iota), keeping every tensor's minor dimension >= 128 — a
    (TI, TJ, 5, 5) layout would waste 96% of each TPU lane register;
  * the normalisation division folds into the log identity
    ``sum pm*xlogx(A/Z) = (sum pm*A*lnA - lnZ*Z)/Z`` so only (BI, BJ)
    tensors are divided.
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


def _group_indicator(n_cols: int, dtype):
    """(n_cols*5, n_cols) 0/1 matrix: G[a, i] = 1 iff a // 5 == i."""
    a = jax.lax.broadcasted_iota(jnp.int32, (n_cols * N_STATES, n_cols), 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (n_cols * N_STATES, n_cols), 1)
    return (a // N_STATES == i).astype(dtype)


def _ln_pos(x):
    return jnp.log(jnp.where(x > 0, x, 1.0))


def _rowsum5(x):
    """(n*5, m) -> (n, m) group sum over the major axis — exact f32 VPU
    adds, and the reshape is layout-free (splits the major dimension)."""
    n5, m = x.shape
    return x.reshape(n5 // N_STATES, N_STATES, m).sum(axis=1)


def _split_dot(x, M, interpret=False):
    """x(f32) @ M(bf16 0/1): two DEFAULT-precision MXU passes via a
    bf16 hi/lo split of x — the 0/1 operand is exact, so accuracy is
    ~2^-16 relative at 1/3 the passes of a HIGHEST f32 dot (which also
    blew the scoped-VMEM budget).  In interpret (XLA) mode a barrier
    stops the compiler cancelling x - f32(bf16(x)); Mosaic neither
    cancels nor lowers the barrier."""
    guard = jax.lax.optimization_barrier if interpret else (lambda v: v)
    xh = guard(x.astype(jnp.bfloat16))
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    d = lambda u: jax.lax.dot_general(
        u, M, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return d(xh) + d(xl)


def _mi_from_block(C, ipf, jpf, pc, bj=BJ, interpret=False, concat=False):
    """(bi, bj) MI from a (bi*5, bj*5) crosstable block in registers.

    Group reductions over i-states (major axis) are exact reshape-sums;
    reductions over j-states (minor axis) are split-dots against the
    jp-masked 0/1 group indicator.  ``concat=True`` fuses the four
    logical dots (A, A*lnA, R*lnR, R against Mj) into TWO split-dots on
    row-concatenated operands — each output row's contraction is
    unchanged (bit-identical results), half the MXU launches at twice
    the M dim (hardware A/B: wins on the serial schedule, loses under
    the deferred overlap — scripts/perf_defer_ab.py).
    """
    f32 = jnp.float32
    Mj = (_group_indicator(bj, f32) * jpf[:, None]).astype(jnp.bfloat16)

    pm = ipf[:, None] * jpf[None, :]
    A = C + pc * pm
    lnA = _ln_pos(A)

    sdot = lambda x, M: _split_dot(x, M, interpret)
    ipc = ipf[:, None]
    R = _rowsum5(A)                        # (128, 640) unmasked row sums
    lnR = _ln_pos(R)
    # joint-entropy numerator G1 = sum_{s1,s2} pm*A*lnA: reduce the
    # i-states FIRST (major-axis reshape-sum, cheap VPU adds) so the
    # Mj-dot and its bf16 split run on a (bi, bj*5) operand instead of
    # (bi*5, bj*5) — 5x less MXU work and 5x fewer split conversions.
    # Equal up to f32 summation order (the 5-term pre-sum replaces the
    # dot's interleaved accumulation).
    T1r = _rowsum5(A * lnA * ipc)          # (128, 640)
    if concat:
        bi_n = R.shape[0]
        gs = sdot(jnp.concatenate([T1r, R * lnR, R], axis=0), Mj)
        G1, Gi_, Si_ = gs[:bi_n], gs[bi_n:2 * bi_n], gs[2 * bi_n:]
        B = sdot(A, Mj)                    # (640, 128) masked col sums
    else:
        B = sdot(A, Mj)                    # (640, 128) masked col sums
        G1 = sdot(T1r, Mj)                 # (128, 128) sum pm*A*lnA
        Gi_ = sdot(R * lnR, Mj)            # (128, 128)
        Si_ = sdot(R, Mj)
    Z = _rowsum5(B * ipc)                  # (128, 128)
    lnB = _ln_pos(B)
    Gj_ = _rowsum5(B * lnB * ipc)          # i-marginal entropy numerator
    # j-marginal uses the FULL row sum over all i-states (mi.hpp:173)

    invZ = 1.0 / jnp.maximum(Z, jnp.finfo(f32).tiny)
    lnZ = _ln_pos(Z)
    jointH = (G1 - lnZ * Z) * invZ
    icondH = (Gi_ - lnZ * Si_) * invZ
    jcondH = (Gj_ - lnZ * Z) * invZ        # S_j == Z (masked sums telescope)
    return jointH - icondH - jcondH


def _kernel(xi_hi_ref, xi_lo_ref, xj_ref, ipf_ref, jpf_ref, ipwf_ref, jpwf_ref,
            mi_ref, wog_ref, C_scratch, *, pc, n_k, bj=BJ, interpret=False,
            mults=(1, 1), acc_scale=1.0):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        C_scratch[:] = jnp.zeros_like(C_scratch)

    _acc_passes(C_scratch, (xi_hi_ref, xi_lo_ref), xj_ref, mults)

    @pl.when(k == n_k - 1)
    def _():
        C = _acc_to_f32(C_scratch[:], acc_scale)
        ipf = ipf_ref[0, :]
        jpf = jpf_ref[0, :]
        mi_ref[:] = _mi_from_block(C, ipf, jpf, pc, bj, interpret)
        ipwf = ipwf_ref[0, :]
        jpwf = jpwf_ref[0, :]
        wog_ref[:] = _mi_from_block(C, ipwf, jpwf, pc, bj, interpret)


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


def _kernel_single(*refs, pc, n_k, bj=BJ, interpret=False, n_passes=2,
                   concat=False, mults=(1, 1), acc_scale=1.0):
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
            ipf_ref[0, :], jpf_ref[0, :], pc, bj, interpret,
            concat,
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


def _kernel_single_deferred(*refs, pc, n_k, ni, nj, bj=BJ, interpret=False,
                            n_passes=2, concat=False, mults=(1, 1),
                            acc_scale=1.0):
    """Software-pipelined twin of :func:`_kernel_single`: block n's
    entropy epilogue (VPU-heavy: logs, elementwise, small dots) executes
    during block n+1's FIRST matmul step instead of serially after block
    n's last — the MXU accumulates the next crosstable while the VPU
    drains the previous one.  Two parity-selected accumulators replace
    the single scratch; the final grid block writes its own epilogue on
    its last step (no successor).  Requires n_k >= 2 (callers gate)."""
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
            ipf_ref[0, :], jpf_ref[0, :], pc, bj,
            interpret, concat,
        )

    # the final grid block has no successor: epilogue on its last step
    @pl.when((k == n_k - 1) & (idx == ni * nj - 1))
    def _():
        mi_ref[:] = _mi_from_block(
            _acc_to_f32(C_scratch[p], acc_scale),
            ipf_ref[0, :], jpf_ref[0, :], pc, bj, interpret,
            concat,
        )


def _strided_chunk(bi: int, n_k: int) -> tuple[int, int]:
    """Slab geometry for the strided schedule: slabs slice the previous
    block's (bi*5, bj*5) crosstable along i-state rows, so the row count
    must cover whole i-positions (multiple of 5) on f32 sublane
    boundaries (multiple of 8) -> multiples of 40.  Returns (rows per
    slab, number of slabs); slabs overlap by re-computing identical rows
    when 40*ceil does not divide bi*5 exactly (idempotent rewrites)."""
    rows5 = bi * N_STATES
    c = 40 * -(-rows5 // (40 * n_k))
    return c, -(-rows5 // c)


def _strided_maps(nj: int, n_k: int, last: int):
    """Index maps for the strided schedule: every k step of block idx
    keeps the output/presence windows on block idx-1 (slab writes land
    there), except the final grid block's last step, which swings to the
    block itself for its own epilogue.  Window visits stay contiguous:
    window w is written during all of block w+1's steps (w < last) and
    window ``last`` only on the final step."""

    def tgt(i, j, k):
        idx = i * nj + j
        prev = jnp.maximum(idx - 1, 0)
        return jnp.where((idx == last) & (k == n_k - 1), idx, prev)

    out = lambda i, j, k: (tgt(i, j, k) // nj, tgt(i, j, k) % nj)
    ip = lambda i, j, k: (0, tgt(i, j, k) // nj)
    jp = lambda i, j, k: (0, tgt(i, j, k) % nj)
    return out, ip, jp


def _kernel_single_strided(*refs, pc, n_k, ni, nj, bi=BI, bj=BJ,
                           interpret=False, n_passes=2, mults=(1, 1),
                           acc_scale=1.0):
    """Strided-epilogue twin of :func:`_kernel_single`: the previous
    block's entropy epilogue is split into row SLABS executed
    unconditionally across this block's matmul steps — slab k runs
    right after matmul step k, giving Mosaic MXU work (the crosstable
    pass) and VPU work (the slab's logs/elementwise) in ONE straight-
    line step body instead of a serial whole-block epilogue inside a
    single pl.when (which Mosaic does not overlap with the matmuls).

    Correct because the epilogue is row-parallel: mi rows [r0/5, r0/5+c/5)
    depend only on crosstable rows [r0, r0+c) (every reduction in
    _mi_from_block is either over i-states within a row group or over
    j-states within a row).  The final grid block keeps the serial
    shape: its predecessor's epilogue runs whole at its k==0 and its own
    on its last step (window maps in :func:`_strided_maps`)."""
    if n_passes == 2:
        (xi_hi_ref, xi_lo_ref, xj_ref, ipf_ref, jpf_ref,
         mi_ref, C_scratch) = refs
        xi_refs = (xi_hi_ref, xi_lo_ref)
    else:
        xi_hi_ref, xj_ref, ipf_ref, jpf_ref, mi_ref, C_scratch = refs
        xi_refs = (xi_hi_ref,)
    i, j, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    idx = i * nj + j
    last = ni * nj - 1
    p = jax.lax.rem(idx, 2)
    rows5 = bi * N_STATES
    c, n_slabs = _strided_chunk(bi, n_k)

    @pl.when(k == 0)
    def _():
        C_scratch[p] = jnp.zeros_like(C_scratch[p])

    _acc_passes(C_scratch, xi_refs, xj_ref, mults[:n_passes], idx=p)

    # slab s of the previous block's epilogue runs at matmul step k == s
    # (plain blocks only).  The loop is unrolled in Python so every
    # slice offset is STATIC — Mosaic cannot prove alignment of
    # dynamically-offset vector loads at these shapes (hardware compile
    # rejects pl.ds with traced offsets here even with multiple_of
    # hints), but static slices are free.
    for s in range(n_slabs):
        r0 = min(s * c, rows5 - c)

        @pl.when((idx > 0) & (idx != last) & (k == s))
        def _(r0=r0):
            A = _acc_to_f32(C_scratch[1 - p, r0:r0 + c, :], acc_scale)
            ipf = ipf_ref[0, r0:r0 + c]
            mi_ref[r0 // N_STATES:(r0 + c) // N_STATES, :] = _mi_from_block(
                A, ipf, jpf_ref[0, :], pc, bj, interpret)

    # the final block serialises: whole predecessor epilogue at k==0
    # (its last slab would collide with the own-epilogue window swing),
    # own epilogue on the last step.  With one grid block the k==0 write
    # is uninitialised-scratch garbage into the block's own window,
    # overwritten by the k==n_k-1 epilogue before write-back.
    @pl.when((idx == last) & (k == 0))
    def _():
        mi_ref[:] = _mi_from_block(
            _acc_to_f32(C_scratch[1 - p], acc_scale),
            ipf_ref[0, :], jpf_ref[0, :], pc, bj, interpret)

    @pl.when((idx == last) & (k == n_k - 1))
    def _():
        mi_ref[:] = _mi_from_block(
            _acc_to_f32(C_scratch[p], acc_scale),
            ipf_ref[0, :], jpf_ref[0, :], pc, bj, interpret)


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
    epi_concat: bool = False,
    pass_mults: tuple = (1, 1),
    acc_scale: float = 1.0,
    schedule: str | None = None,
) -> jnp.ndarray:
    """mi (TI, TJ) f32 only — same matmul + epilogue as the dual kernel
    minus the wog pass (bit-identical mi values).

    ``defer`` selects the software-pipelined schedule (epilogue of block
    n overlaps block n+1's matmul; bit-identical results — same
    accumulation and epilogue math, only the schedule moves).  Default:
    on when the S grid has >= 2 steps; SPYDRPICK_PALLAS_DEFER=0 opts
    out.

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
    if schedule not in ("serial", "defer", "strided"):
        raise ValueError(
            f"unknown pallas schedule {schedule!r} "
            "(expected serial | defer | strided)")
    if n_k < 2:
        schedule = "serial"  # pipelined schedules need a successor step
    acc_dt = jnp.int32 if xi_hi.dtype == jnp.int8 else jnp.float32
    assert xj.dtype == xi_hi.dtype, (xi_hi.dtype, xj.dtype)

    xi_spec = pl.BlockSpec((bs, bi * N_STATES), lambda i, j, k: (k, i))
    if schedule == "strided":
        kernel = functools.partial(
            _kernel_single_strided, pc=pseudocount, n_k=n_k, ni=ni, nj=nj,
            bi=bi, bj=bj, interpret=interpret, n_passes=n_passes,
            mults=pass_mults, acc_scale=acc_scale,
        )
        out_map, ip_map, jp_map = _strided_maps(nj, n_k, ni * nj - 1)
        scratch = pltpu.VMEM((2, bi * N_STATES, bj * N_STATES), acc_dt)
    elif schedule == "defer":
        kernel = functools.partial(
            _kernel_single_deferred, pc=pseudocount, n_k=n_k, ni=ni, nj=nj,
            bj=bj, interpret=interpret, n_passes=n_passes,
            concat=epi_concat, mults=pass_mults, acc_scale=acc_scale,
        )
        out_map, ip_map, jp_map = _shifted_maps(nj)
        scratch = pltpu.VMEM((2, bi * N_STATES, bj * N_STATES), acc_dt)
    else:
        kernel = functools.partial(_kernel_single, pc=pseudocount, n_k=n_k,
                                   bj=bj, interpret=interpret,
                                   n_passes=n_passes, concat=epi_concat,
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
    sits between this and :func:`mi_epilogue_pallas`).

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


def _epilogue_kernel(*refs, pc, bj, interpret, dual):
    if dual:
        c_ref, ipf_ref, jpf_ref, ipwf_ref, jpwf_ref, mi_ref, wog_ref = refs
    else:
        c_ref, ipf_ref, jpf_ref, mi_ref = refs
    C = c_ref[:]
    mi_ref[:] = _mi_from_block(C, ipf_ref[0, :], jpf_ref[0, :], pc, bj,
                               interpret)
    if dual:
        wog_ref[:] = _mi_from_block(C, ipwf_ref[0, :], jpwf_ref[0, :], pc,
                                    bj, interpret)


def mi_epilogue_pallas(
    C: jnp.ndarray,        # (TI*5, TJ*5) f32 (psum-merged) crosstable
    ipf: jnp.ndarray,      # (TI*5,) f32 presence
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
        functools.partial(_epilogue_kernel, pc=pseudocount, bj=bj,
                          interpret=interpret, dual=dual),
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
    xi_hi: jnp.ndarray,   # (S, TI*5) bf16 weighted one-hot, hi part
    xi_lo: jnp.ndarray,   # (S, TI*5) bf16 residual
    xj: jnp.ndarray,      # (S, TJ*5) bf16 one-hot
    ipf: jnp.ndarray,     # (TI*5,) f32 presence
    jpf: jnp.ndarray,     # (TJ*5,) f32
    ipwf: jnp.ndarray,    # (TI*5,) f32 presence w/o gaps
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

    kernel = functools.partial(_kernel, pc=pseudocount, n_k=n_k, bj=bj,
                               interpret=interpret, mults=pass_mults,
                               acc_scale=acc_scale)
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
            # the entropy stage's HIGHEST-precision dots need more scoped
            # VMEM than the 16MB default (measured 18.4MB)
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        xi_hi, xi_lo, xj,
        ipf.reshape(1, -1), jpf.reshape(1, -1),
        ipwf.reshape(1, -1), jpwf.reshape(1, -1),
    )
    return mi, wog
