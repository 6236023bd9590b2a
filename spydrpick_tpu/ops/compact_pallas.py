"""Pallas streaming edge-compaction (two-phase, chain-free).

Extracts {ipos, jpos, mi, mi_wog} of entries with ``mi > threshold``
(upper triangle, valid range) from the (T, Lp) MI row buffers into a
dense K-capacity buffer — the static-shape replacement for the
reference's dynamic ``Graph::add`` under lock (mi.hpp:411-463).

Why a kernel: XLA lowers this to flat cumsum + scatter, measured at
~50 ms per (512, 8192) row on a v5e — 300x off memory speed and the
dominant cost of the whole sweep.

Two phases:
  1. XLA: per chunk-row (a (1, CW) strip) edge counts, 128-aligned
     exclusive-scan offsets (cheap: ~T*Lp/CW elements);
  2. Pallas: re-reads the buffers and writes each non-empty chunk-row's
     compacted segment at its precomputed offset.  No cross-grid-step
     state — a previous single-pass design carried the append cursor in
     SMEM, and the resulting serial chain capped throughput at
     ~150M elem/s regardless of block size.

Local compaction trick: a chunk's masked elements are gathered with a
transposed one-hot permutation matmul — ``Pt[d, s] = (dest[s] == d)``
and ``out = payload @ Pt^T-contract`` — turning a scatter into an MXU
op.  All four payload rows ride one matmul via a 3-way bf16 split
(exact for integers < 2^24; ~2^-24 relative for MI values).

Segments start 128-aligned (Mosaic vector-store constraint), so the
kernel buffer contains alignment holes; a third, XLA phase ("repack")
gathers the segments into a dense K-capacity buffer using the phase-1
counts — at realistic edge densities (~1 edge per chunk-row) the
aligned extent is ~100x the true edge count, so returning the aligned
buffer directly both wasted capacity and (in round 1) made every row
look overflowed, silently degrading the sweep to full-row host
re-extraction.  The repack is O(K) 1-D gathers — negligible next to
the (T, Lp) phase-1/2 passes.

Mosaic pitfalls encoded here (each crashed or miscompiled otherwise):
concatenate/broadcast of (1, CW) operands (use full-tile rolls),
cumsum (Hillis-Steele lane rolls), dynamic_slice on values (static
unroll), f32 HIGHEST dots (bf16 split), unaligned vector stores
(pl.multiple_of + aligned offsets).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8       # buffer rows per grid step
CW = 512      # max chunk width (reserved slots in the K window)
# kernel staging-buffer cap, in slots.  The worst-case aligned extent is
# 128 per chunk-row = T*Lp/CW*128 slots; that bound is allocated exactly
# when below this cap (then clamping can never corrupt a segment), and
# rows whose extent exceeds a capped buffer are poisoned so the caller's
# overflow path re-extracts them.
KBUF_CAP = 1 << 23


def _chunk_width(Lp: int) -> int:
    """Largest chunk width dividing Lp (Lp is a multiple of 128 when the
    Pallas paths are enabled)."""
    for w in (512, 256, 128):
        if Lp % w == 0:
            return w
    raise ValueError(f"Lp={Lp} not a multiple of 128")


def _masks(mi_buf, i0, threshold, L):
    T, Lp = mi_buf.shape
    j_glob = jax.lax.broadcasted_iota(jnp.int32, (T, Lp), 1)
    i_glob = i0 + jax.lax.broadcasted_iota(jnp.int32, (T, Lp), 0)
    return (mi_buf > threshold) & (j_glob > i_glob) & (j_glob < L) & (i_glob < L)


def _kernel(offs_ref, i0_ref, thr_ref, zeros_ref, mi_ref, wog_ref, out_ref,
            stage, sem, *, T, Lp, L, K, CW, nbj, INTERPRET):
    bi = pl.program_id(0)
    bj = pl.program_id(1)

    mi = mi_ref[:]     # (SUB, CW)
    wog = wog_ref[:]
    i0v = i0_ref[0]
    thr = thr_ref[0]

    j_glob = (bj * CW + jax.lax.broadcasted_iota(jnp.int32, (SUB, CW), 1))
    i_glob = i0v + bi * SUB + jax.lax.broadcasted_iota(jnp.int32, (SUB, CW), 0)
    mask = (mi > thr) & (j_glob > i_glob) & (j_glob < L) & (i_glob < L)

    rid = jax.lax.broadcasted_iota(jnp.int32, (SUB, CW), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, CW), 1)
    roll = jnp.roll if INTERPRET else pltpu.roll
    row1 = lambda x, r: x[r : r + 1, :]

    def _prefix_sum(x):
        s = x
        sh = 1
        while sh < CW:
            s = s + jnp.where(col_iota >= sh, roll(s, sh, axis=1), 0)
            sh *= 2
        return s

    NK = T * nbj

    def _sub_row(r, dest_all, mi_m, wog_m, j_f, i_f):
        # scalar-prefetch count: predicating the DMA on a value derived
        # from vector memory lost writes on hardware.
        # kk follows the WRITE order (grid steps row-major with bj minor,
        # r innermost): each (8, CW) segment DMA writes a full CW window
        # whose tail overhang (zeros beyond ceil128(cnt)) extends into
        # the next segments' slots — offsets assigned in write order
        # guarantee the overhang only covers segments written later,
        # which then overwrite it.
        kk = (bi * nbj + bj) * SUB + r
        cnt = offs_ref[NK + kk]

        @pl.when(cnt > 0)
        def _():
            dest = row1(dest_all, r)
            d_iota = jax.lax.broadcasted_iota(jnp.int32, (CW, CW), 0)
            Pt = (jnp.broadcast_to(dest, (CW, CW)) == d_iota).astype(jnp.bfloat16)
            payload = (
                jnp.where(rid == 0, roll(mi_m, -r % SUB, axis=0), 0.0)
                + jnp.where(rid == 1, roll(wog_m, (1 - r) % SUB, axis=0), 0.0)
                + jnp.where(rid == 2, roll(j_f, (2 - r) % SUB, axis=0), 0.0)
                + jnp.where(rid == 3, roll(i_f, (3 - r) % SUB, axis=0), 0.0)
            )
            guard = jax.lax.optimization_barrier if INTERPRET else (lambda x: x)
            p1 = guard(payload.astype(jnp.bfloat16))
            r1 = payload - p1.astype(jnp.float32)
            p2 = guard(r1.astype(jnp.bfloat16))
            p3 = (r1 - p2.astype(jnp.float32)).astype(jnp.bfloat16)
            d = lambda x: jax.lax.dot_general(
                x, Pt, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            compacted = (d(p1) + d(p2) + d(p3))[0:8, :]
            # precomputed, 128-aligned, clamped segment offset; the
            # output lives in HBM (zeros-aliased input) and each
            # segment is DMA'd directly — a VMEM-resident revisited
            # output block gets double-buffer-copied (8 MB) every grid
            # step, which both cost ~30 ms/row and lost writes
            off_w = pl.multiple_of(jnp.minimum(offs_ref[kk], K - CW), 128)
            # per-sub-row stage slot + semaphore: sharing one buffer
            # across the unrolled predicated DMAs lost every write but
            # the first within a grid step (observed on hardware)
            stage[r] = compacted
            copy = pltpu.make_async_copy(
                stage.at[r], out_ref.at[:, pl.dslice(off_w, CW)], sem.at[r]
            )
            copy.start()
            copy.wait()

    # NOTE: no outer block-level pl.when — nesting the per-row
    # predicated DMA under a second predicate lost writes on hardware
    prefix_all = _prefix_sum(mask.astype(jnp.int32))
    dest_all = jnp.where(mask, prefix_all - 1, CW)
    mi_m = jnp.where(mask, mi, 0.0)
    wog_m = jnp.where(mask, wog, 0.0)
    j_f = j_glob.astype(jnp.float32)
    i_f = i_glob.astype(jnp.float32)
    for r in range(SUB):
        _sub_row(r, dest_all, mi_m, wog_m, j_f, i_f)


def compact_edges_pallas(
    mi_buf: jnp.ndarray,    # (T, Lp) f32
    wog_buf: jnp.ndarray,   # (T, Lp) f32
    i0,                      # scalar int32: block-row start
    threshold,               # scalar f32
    L: int,
    K: int,
    interpret: bool | None = None,
):
    """Returns dense (vals (K,) f32, wogs (K,) f32, ipos (K,) i32,
    jpos (K,) i32, count i32) — the first ``count`` entries are the
    edges with mi > threshold in the upper-triangle valid range, in
    row-major buffer order; ``count`` is the TRUE edge count (overflow
    iff count > K).

    If the 128-aligned staging extent exceeds the (capped) kernel
    buffer — only possible at extreme edge density with Lp large enough
    to hit KBUF_CAP — the outputs are zeroed and count is poisoned to
    2^30 so the caller's overflow path re-extracts the row on the host.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T, Lp = mi_buf.shape
    cw = _chunk_width(Lp)
    assert T % SUB == 0, T
    K_out = K
    nbj_ = Lp // cw
    NC = T * nbj_
    # staging capacity: extent <= count + 127*NC, so K_out + 128*NC
    # guarantees a row with count <= K_out is never poisoned (a row
    # with count > K_out overflows regardless); T*Lp bounds the fully
    # dense case, and KBUF_CAP bounds memory (poison-on-clamp beyond)
    KBUF = min(K_out + 128 * NC + cw, T * Lp + cw, KBUF_CAP)
    K = KBUF
    nbj = Lp // cw
    grid = (T // SUB, nbj)

    mi_buf = mi_buf.astype(jnp.float32)
    wog_buf = wog_buf.astype(jnp.float32)
    i0 = jnp.asarray(i0, jnp.int32)
    thr = jnp.asarray(threshold, jnp.float32)

    # phase 1 (XLA): per chunk-row counts -> aligned exclusive offsets,
    # in the kernel's WRITE order (bi, bj, r) — see _sub_row
    mask = _masks(mi_buf, i0, thr, L)
    counts = mask.reshape(T, nbj, cw).sum(axis=2).astype(jnp.int32)   # (T, nbj)
    counts_w = (
        counts.reshape(T // SUB, SUB, nbj).transpose(0, 2, 1).reshape(-1)
    )
    aligned = jnp.where(counts_w > 0, ((counts_w + 127) // 128) * 128, 0)
    ends = jnp.cumsum(aligned)
    offs = (ends - aligned).astype(jnp.int32)                         # exclusive
    extent = ends[-1].astype(jnp.int32)
    offs = jnp.concatenate([offs, counts_w])                          # + counts

    # scalar-prefetch payload: the per-chunk-row segment offsets

    kernel = functools.partial(_kernel, T=T, Lp=Lp, L=L, K=K, CW=cw,
                               nbj=nbj, INTERPRET=interpret)
    zeros = jnp.zeros((8, K), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                  # i0
            pl.BlockSpec(memory_space=pltpu.SMEM),                  # threshold
            pl.BlockSpec(memory_space=pltpu.ANY),                   # zeros->out
            pl.BlockSpec((SUB, cw), lambda i, j, s: (i, j)),        # mi
            pl.BlockSpec((SUB, cw), lambda i, j, s: (i, j)),        # wog
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((SUB, 8, cw), jnp.float32),
            pltpu.SemaphoreType.DMA((SUB,)),
        ],
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((8, K), jnp.float32)],
        # the zeros input IS the output buffer: holes stay zero and the
        # kernel only writes real segments
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
            has_side_effects=True,
        ),
        interpret=interpret,
    )(offs, i0.reshape(1), thr.reshape(1), zeros, mi_buf, wog_buf)

    # phase 3 (XLA repack): squeeze the 128-aligned holes out into a
    # dense K_out window.  For output slot t, its source chunk-row is
    # located by binary search over the true-count prefix sums, and the
    # within-chunk rank indexes into that chunk's aligned segment.
    ends_true = jnp.cumsum(counts_w)
    starts_true = ends_true - counts_w
    count = ends_true[-1]
    t_idx = jnp.arange(K_out, dtype=jnp.int32)
    c = jnp.searchsorted(ends_true, t_idx, side="right").astype(jnp.int32)
    c = jnp.minimum(c, counts_w.shape[0] - 1)
    # if any segment offset reached the clamp region [K-CW, K), writes
    # overlapped — poison the row (never triggers when KBUF covers the
    # worst-case extent + CW slack)
    bad = extent > K - cw
    valid = (t_idx < count) & jnp.logical_not(bad)
    src = jnp.where(valid, offs[c] + (t_idx - starts_true[c]), 0)
    vals = jnp.where(valid, out[0, src], 0.0)
    wogs = jnp.where(valid, out[1, src], 0.0)
    jpos = jnp.where(valid, out[2, src].astype(jnp.int32), 0)
    ipos = jnp.where(valid, out[3, src].astype(jnp.int32), 0)
    count = jnp.where(bad, jnp.int32(1 << 30), count)
    return vals, wogs, ipos, jpos, count
