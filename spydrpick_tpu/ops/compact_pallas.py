"""Pallas streaming edge-compaction kernel.

Extracts {ipos, jpos, mi, mi_wog} of entries with ``mi > threshold``
(upper triangle, valid range) from the (T, Lp) MI row buffers into a
dense K-capacity buffer — the static-shape replacement for the
reference's dynamic ``Graph::add`` under lock (mi.hpp:411-463).

Why a kernel: XLA lowers this to flat cumsum + scatter, measured at
~50 ms per (512, 8192) row on a v5e — 300x off memory speed, and the
dominant cost of the whole sweep.  Here the buffers stream through
VMEM once; compacted segments append to a VMEM staging buffer at an
SMEM offset cursor, with empty chunks skipped by predication, and one
bulk DMA... (the staging buffer IS the pallas output block, written
once per grid step via the normal pipeline).

Local compaction trick: a chunk's masked elements are gathered by a
one-hot permutation matmul — ``P[s, d] = mask[s] & (prefix[s]-1 == d)``
and ``out = vals @ P`` — turning a scatter into an MXU op.

All four payloads ride one (4, CW) matmul: [mi, wog, jpos, flags].
Positions are exact in f32 (Lp < 2^24).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8       # buffer rows per grid step
CW = 512      # max chunk width (reserved slots in the K window)
KMAX = 1 << 18  # kernel-side capacity cap (the (8, K) VMEM buffer)


def _chunk_width(Lp: int) -> int:
    """Largest chunk width dividing Lp (Lp is a multiple of 128 when the
    Pallas paths are enabled)."""
    for w in (512, 256, 128):
        if Lp % w == 0:
            return w
    raise ValueError(f"Lp={Lp} not a multiple of 128")


def _kernel(i0_ref, thr_ref, mi_ref, wog_ref, out_ref, cnt_ref, off_sm, cnt_sm,
            *, T, Lp, L, K, CW, INTERPRET):
    bi = pl.program_id(0)
    bj = pl.program_id(1)
    nbi = pl.num_programs(0)
    nbj = pl.num_programs(1)

    @pl.when((bi == 0) & (bj == 0))
    def _():
        off_sm[0] = 0
        cnt_sm[0] = 0
        out_ref[...] = jnp.zeros_like(out_ref)

    i0 = i0_ref[0]
    thr = thr_ref[0]
    mi = mi_ref[:]     # (SUB, CW)
    wog = wog_ref[:]

    j_glob = (bj * CW + jax.lax.broadcasted_iota(jnp.int32, (SUB, CW), 1))
    i_glob = i0 + bi * SUB + jax.lax.broadcasted_iota(jnp.int32, (SUB, CW), 0)
    mask = (mi > thr) & (j_glob > i_glob) & (j_glob < L) & (i_glob < L)

    # static row index: unrolled below (Mosaic lacks dynamic_slice on
    # values, and SUB=8 unrolls cheaply)
    row1 = lambda x, r: x[r : r + 1, :]  # (1, CW)

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, CW), 1)

    def _prefix_sum(x):
        """Inclusive scan over axis 1 of (SUB, CW) (Mosaic has no cumsum
        primitive): Hillis-Steele with lane rolls, log2(CW) steps.
        Operating on the full (8, CW) tile keeps Mosaic's sublane shape
        happy (a (1, CW) roll crashed the compiler)."""
        s = x
        sh = 1
        while sh < CW:
            rolled = (jnp.roll if INTERPRET else pltpu.roll)(s, sh, axis=1)
            s = s + jnp.where(col_iota >= sh, rolled, 0)
            sh *= 2
        return s

    prefix_all = _prefix_sum(mask.astype(jnp.int32))       # (SUB, CW)
    dest_all = jnp.where(mask, prefix_all - 1, CW)         # CW == dropped
    counts = jnp.sum(mask.astype(jnp.int32), axis=1, keepdims=True)  # (SUB, 1)

    def sub_row(r):
        row_mask = row1(mask, r)
        cnt = counts[r, 0]

        @pl.when(cnt > 0)
        def _():
            dest = row1(dest_all, r)
            # transposed one-hot: Pt[d, s] = (dest[s] == d) — built by
            # broadcasting along sublanes, no lane->sublane relayout
            d_iota = jax.lax.broadcasted_iota(jnp.int32, (CW, CW), 0)
            Pt = (jnp.broadcast_to(dest, (CW, CW)) == d_iota).astype(jnp.bfloat16)
            # zero out unmasked entries: the buffers hold -inf outside
            # the computed region and -inf * 0 = NaN in the matmul
            # padded to 8 rows: Mosaic sub-tile stores need the
            # sublane dimension at the full 8 (a (4, CW) store crashed
            # the compiler)
            # (8, CW) payload without concatenate (Mosaic's concat of
            # (1, CW) pieces crashed the compiler): broadcast each row
            # and select by sublane index
            rid = jax.lax.broadcasted_iota(jnp.int32, (SUB, CW), 0)
            bc = lambda x: jnp.broadcast_to(x, (SUB, CW))
            payload = (
                jnp.where(rid == 0, bc(jnp.where(row_mask, row1(mi, r), 0.0)), 0.0)
                + jnp.where(rid == 1, bc(jnp.where(row_mask, row1(wog, r), 0.0)), 0.0)
                + jnp.where(rid == 2, bc(row1(j_glob, r).astype(jnp.float32)), 0.0)
                + jnp.where(rid == 3, bc(row1(i_glob, r).astype(jnp.float32)), 0.0)
            )  # (8, CW)
            # 3-way bf16 split: Mosaic crashes on an f32xbf16 HIGHEST dot
            # here; three DEFAULT-precision bf16 dots are exact for
            # integers < 2^24 (the position rows) and ~2^-24 relative
            # for the MI rows
            p1 = payload.astype(jnp.bfloat16)
            r1 = payload - p1.astype(jnp.float32)
            p2 = r1.astype(jnp.bfloat16)
            p3 = (r1 - p2.astype(jnp.float32)).astype(jnp.bfloat16)
            d = lambda x: jax.lax.dot_general(
                x, Pt, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            compacted = d(p1) + d(p2) + d(p3)  # (8, CW); cols beyond cnt zero
            # Mosaic vector stores need 128-aligned starts: the cursor is
            # kept 128-aligned, so segments are zero-padded ("holes") up
            # to the next alignment boundary — compacted columns beyond
            # cnt are exact zeros and the host filters mi > threshold.
            off = pl.multiple_of(jnp.minimum(off_sm[0], K - CW), 128)
            if INTERPRET:
                # the interpreter rejects traced slice starts; a full
                # read-modify-write is fine for CPU emulation
                out_ref[...] = jax.lax.dynamic_update_slice(
                    out_ref[...], compacted, (0, off)
                )
            else:
                out_ref[:, pl.dslice(off, CW)] = compacted
            off_sm[0] = ((off + cnt + 127) // 128) * 128
            cnt_sm[0] = cnt_sm[0] + cnt

    for r in range(SUB):
        sub_row(r)

    @pl.when((bi == nbi - 1) & (bj == nbj - 1))
    def _():
        cnt_ref[0] = off_sm[0]   # valid extent of the output buffer
        cnt_ref[1] = cnt_sm[0]   # true edge count (diagnostics)


def compact_edges_pallas(
    mi_buf: jnp.ndarray,    # (T, Lp) f32
    wog_buf: jnp.ndarray,   # (T, Lp) f32
    i0,                      # scalar int32: block-row start
    threshold,               # scalar f32
    L: int,
    K: int,
    interpret: bool | None = None,
):
    """Returns (out (4, K) f32 rows [mi, wog, jpos, ipos], extent int32).

    Valid entries live in [:, :extent] interleaved with exact-zero
    alignment holes — callers must filter ``mi > threshold``.  Per-row
    overflow is detected via extent > usable capacity.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T, Lp = mi_buf.shape
    cw = _chunk_width(Lp)
    assert T % SUB == 0, T
    K = min(K, KMAX)
    grid = (T // SUB, Lp // cw)

    kernel = functools.partial(_kernel, T=T, Lp=Lp, L=L, K=K, CW=cw,
                               INTERPRET=interpret)
    out, cnt = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),         # i0
            pl.BlockSpec(memory_space=pltpu.SMEM),         # threshold
            pl.BlockSpec((SUB, cw), lambda i, j: (i, j)),  # mi
            pl.BlockSpec((SUB, cw), lambda i, j: (i, j)),  # wog
        ],
        out_specs=[
            pl.BlockSpec((8, K), lambda i, j: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, K), jnp.float32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray(i0, jnp.int32).reshape(1),
        jnp.asarray(threshold, jnp.float32).reshape(1),
        mi_buf.astype(jnp.float32),
        wog_buf.astype(jnp.float32),
    )
    return out, cnt[0]
