"""Roll-routing edge compaction: exact, scatter-free, pure XLA.

Replaces both earlier compaction paths (flat cumsum+scatter, and the
two-phase Pallas kernel whose dense repack was an element gather) for
the hot sweep.  Element-granular gather/scatter runs at ~20M elem/s on
TPU (~50 ns/element, measured) — ~100 ms per (512, 30720) block-row —
because XLA lowers 1-D dynamic addressing serially.  This module never
gathers or scatters at element granularity:

  1. *Monotone bit-serial routing* compacts every i-row of the (T, Lp)
     buffer to a dense prefix using only static lane rolls + selects:
     each surviving element must move left by ``shift = lane - rank``
     (its count of dropped predecessors), which is non-decreasing along
     the row, so routing one bit of ``shift`` at a time (round b moves
     elements with bit b set left by 2^b) keeps all in-flight elements
     at distinct positions — for masked l < l':
     ``p_b[l'] - p_b[l] >= #masked[l, l') >= 1`` at every round.
     15 rounds of roll+select replace the scatter entirely, and the
     payload values are routed verbatim (bit-exact, unlike the
     one-hot-matmul gather which rounded through bf16 splits).
  2. *Line-granular assembly*: each i-row's dense prefix occupies
     ``ceil(count_i / LN)`` 128-lane lines; a row-gather at line
     granularity (slices of 128 contiguous lanes — the fast gather
     shape on TPU) packs them into the (K/LN, LN) store-format window.
     Sub-line tails are zeroed and carry ``jpos = 0``, which the
     standard ``jpos > ipos`` fetch filter drops.

Role in the reference: the lock-protected dynamic ``Graph::add`` of
the hot loop (include/mi.hpp:411-463).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _vmem_budget_bytes() -> int:
    """Per-core VMEM of the default backend's devices.

    The routing kernel's block cap was tuned/validated on v5e (128 MB
    VMEM); on 16 MB-VMEM generations (v2/v3) the same block would fail
    Mosaic compilation or OOM, so the cap — and the default-on gate in
    :func:`compact_edges_route` — scales with this budget."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:  # pragma: no cover - no devices (doc builds etc.)
        return 128 * 1024 * 1024
    if "v2" in kind or "v3" in kind:
        return 16 * 1024 * 1024
    return 128 * 1024 * 1024


def _route_block_cap_elems() -> int:
    """Largest safe br*W block (elements) for route_rows_pallas.

    2^20 elements was hardware-validated against a 128 MB-VMEM part
    (~72 MB of scoped allocations incl. double buffering — see the
    comment in route_rows_pallas); scale linearly with smaller VMEM."""
    return min(1 << 20, _vmem_budget_bytes() // 128)


def _route_shift(mask: jnp.ndarray) -> jnp.ndarray:
    """(R, N) routing state: left-shift distance for surviving lanes
    (count of dropped predecessors), 0 for dead lanes (never move)."""
    drop = (~mask).astype(jnp.int32)
    shift = jnp.cumsum(drop, axis=1) - drop
    return jnp.where(mask, shift, 0)


def _route_kernel(*refs, bits, W, with_wog):
    """All routing rounds over one (BR, W) row block, VMEM-resident —
    the XLA version streams ~log2(W) full roll+select passes through
    HBM (~13 GB per (512, 30720) block-row); here HBM sees each array
    once.  jidx is built from iota in-register (never read from HBM);
    it is buffer-LOCAL — the caller adds the window offset post-route
    (so the offset may be a traced value: one compiled program serves
    every window of a j-chunked sweep)."""
    from jax.experimental.pallas import tpu as pltpu

    if with_wog:
        rs_ref, mi_ref, wog_ref, omi_ref, oj_ref, owog_ref = refs
        wog = wog_ref[:]
    else:
        rs_ref, mi_ref, omi_ref, oj_ref = refs
        wog = None
    rs = rs_ref[:]
    mi = mi_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, rs.shape, 1)
    jidx = lane
    for b in range(bits):
        sh = 1 << b
        # left-rotate by sh == pltpu.roll by W - sh (shift must be >= 0)
        lrot = lambda x: pltpu.roll(x, W - sh, 1)
        src_rs = lrot(rs)
        take = ((src_rs >> b) & 1 == 1) & (lane + sh < W)
        moved = (rs >> b) & 1 == 1
        rs = jnp.where(take, src_rs - sh, jnp.where(moved, 0, rs))
        mi = jnp.where(take, lrot(mi), mi)
        jidx = jnp.where(take, lrot(jidx), jidx)
        if with_wog:
            wog = jnp.where(take, lrot(wog), wog)
    omi_ref[:] = mi
    oj_ref[:] = jidx
    if with_wog:
        owog_ref[:] = wog


def route_rows_pallas(mask, mi, wog=None,
                      interpret: bool | None = None):
    """Pallas twin of :func:`route_rows` for the store compaction:
    returns (routed_mi, routed_local_jidx[int32], routed_wog_or_None,
    counts), bit-identical to the XLA routing (values move verbatim).
    jidx is buffer-local; callers add their window offset.

    Requires W % 128 == 0 and R % 8 == 0 (production shapes; callers
    fall back to the XLA path otherwise)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R, W = mask.shape
    cap = _route_block_cap_elems()
    if 8 * W > cap and not interpret:
        # even the minimum 8-row block would exceed the validated VMEM
        # budget; callers (compact_edges_route) gate on this same cap
        # and fall back to the XLA route before getting here
        raise ValueError(
            f"route_rows_pallas: width {W} needs {8 * W} block elements "
            f"> VMEM-safe cap {cap}; use route_rows (XLA) or window the "
            "row (engine row_window auto-windows past 2^17 columns)"
        )
    bits = int(W - 1).bit_length()
    rs = _route_shift(mask)
    counts = mask.sum(axis=1, dtype=jnp.int32)

    # block rows sized to VMEM: with wog there are 6 I/O windows, each
    # double-buffered (12x br*W*4 B), plus ~5 in-kernel live arrays
    # (rs/mi/jidx/wog + one rolled copy) -> ~17x br*W*4 B total; capping
    # br*W at 2^20 elements keeps that ~72 MB (v5e VMEM is 128 MB, and
    # br*W = 2^21 OOM'd at W=30720 with "output window 15.00M x2
    # buffering" scoped allocations); the cap scales down with the
    # device's VMEM (_route_block_cap_elems)
    br = 8
    while br * 2 <= min(R, 256) and R % (br * 2) == 0 and (br * 2) * W <= cap:
        br *= 2

    with_wog = wog is not None
    kernel = functools.partial(_route_kernel, bits=bits, W=W,
                               with_wog=with_wog)
    spec = pl.BlockSpec((br, W), lambda i: (i, 0))
    n_in = 3 if with_wog else 2
    outs = [
        jax.ShapeDtypeStruct((R, W), mi.dtype),
        jax.ShapeDtypeStruct((R, W), jnp.int32),
    ] + ([jax.ShapeDtypeStruct((R, W), mi.dtype)] if with_wog else [])
    res = pl.pallas_call(
        kernel,
        grid=(R // br,),
        in_specs=[spec] * n_in,
        out_specs=[spec] * len(outs),
        out_shape=outs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(100 * 1024 * 1024,
                                 int(0.8 * _vmem_budget_bytes())),
        ),
        interpret=interpret,
    )(*((rs, mi, wog) if with_wog else (rs, mi)))
    omi, oj = res[0], res[1]
    return omi, oj, (res[2] if with_wog else None), counts


def route_rows(mask: jnp.ndarray, payloads: tuple[jnp.ndarray, ...]):
    """Compact each row of ``mask`` (R, N) to a dense prefix.

    Returns (routed_payloads, counts): routed payload rows hold, in
    lanes [0, counts[r]), the payload values of the masked lanes in
    order; lanes beyond that hold stale garbage (callers mask them).
    Payloads must be f32 (values are moved verbatim; integer payloads
    are exact below 2^24).
    """
    R, N = mask.shape
    bits = int(N - 1).bit_length()
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, N), 1)
    # exclusive count of dropped predecessors == left-shift distance
    drop = (~mask).astype(jnp.int32)
    shift = jnp.cumsum(drop, axis=1) - drop
    rs = jnp.where(mask, shift, 0)  # 0 == settled/dead (never moves)

    ps = list(payloads)
    for b in range(bits):
        sh = 1 << b
        src_rs = jnp.roll(rs, -sh, axis=1)
        # wrap guard: lanes reading circularly past the row end must not
        # accept (a wrapped copy would be a live duplicate)
        take = ((src_rs >> b) & 1 == 1) & (lane + sh < N)
        moved = (rs >> b) & 1 == 1
        rs = jnp.where(take, src_rs - sh, jnp.where(moved, 0, rs))
        ps = [jnp.where(take, jnp.roll(p, -sh, axis=1), p) for p in ps]
    counts = mask.sum(axis=1, dtype=jnp.int32)
    return tuple(ps), counts


def compact_edges_route(mi_buf, wog_buf, store_mask, i0, K: int, LN: int = 128,
                        j_offset: int = 0, pallas_route: bool | None = None):
    """(T, W) buffers + store mask -> store-format dense K window.

    ``wog_buf`` may be None (lazy-wog mode): the wog output is then all
    zeros and only two payloads are routed.

    ``j_offset`` is the global column index of buffer column 0 —
    callers may pass a right-aligned slice of the full row (block-row
    i0 only stores j > i0, so the left half of late rows is dead weight
    for the O(W log W) routing) or a j-chunk window of a row too wide
    to buffer whole.  It may be a TRACED scalar (added to the routed
    local indices post-gather), so one compiled program serves every
    window position; ``i0`` may be traced likewise.

    Returns (vals, wogs, ipos, jpos, count, lines):
      * the (K,) outputs are ``lines`` 128-lane lines of line-packed
        edges (per i-row: ``ceil(count_i/LN)`` lines, zero-padded
        sub-line tails with jpos = 0 < ipos for the fetch filter);
      * ``count`` is the true edge count (poisoned to 2^30 when the
        line-packed extent exceeds the K window so the caller's
        overflow path re-extracts the row);
      * ``lines`` is the number of valid store lines ( <= K/LN ).
    """
    T, Lp = mi_buf.shape
    assert K % LN == 0
    if Lp % LN:  # tiny-config path (tests); production Lp is 128-aligned
        pad = LN - Lp % LN
        padc = [(0, 0), (0, pad)]
        mi_buf = jnp.pad(mi_buf, padc)
        if wog_buf is not None:
            wog_buf = jnp.pad(wog_buf, padc)
        store_mask = jnp.pad(store_mask, padc)
        Lp += pad
    KL = K // LN
    row_lines = Lp // LN

    wd = mi_buf.dtype  # f32, or f64 in x64 oracle-test mode
    if pallas_route is None:
        # Hardware-validated (v5e: full-width parity + canary-exact
        # bench, 2.3x sweep throughput) -> default ON for TPU.
        # SPYDRPICK_PALLAS_ROUTE=0 opts out; =force also enables the
        # interpret-mode kernel off-TPU (integration tests).
        import os

        flag = os.environ.get("SPYDRPICK_PALLAS_ROUTE", "1")
        pallas_route = (
            (flag == "force"
             or (flag == "1" and jax.default_backend() == "tpu"))
            and wd == jnp.float32
            and T % 8 == 0 and Lp % 128 == 0
            # width gate: the minimum 8-row block must fit the device's
            # VMEM-scaled cap (small-VMEM parts / ultra-wide callers
            # fall back to the XLA route instead of failing Mosaic)
            and (flag == "force" or 8 * Lp <= _route_block_cap_elems())
        )
    if pallas_route:
        # VMEM-resident routing rounds (HBM reads each array once vs
        # ~log2(W) full roll+select passes in the XLA fallback)
        r_mi, r_j, r_wog, counts = route_rows_pallas(
            store_mask, mi_buf, wog_buf
        )
    else:
        jidx = jax.lax.broadcasted_iota(wd, (T, Lp), 1)  # buffer-local
        if wog_buf is None:
            (r_mi, r_j), counts = route_rows(store_mask, (mi_buf, jidx))
            r_wog = None
        else:
            (r_mi, r_wog, r_j), counts = route_rows(
                store_mask, (mi_buf, wog_buf.astype(wd), jidx)
            )

    # line bookkeeping: i-row r contributes lines_r = ceil(counts_r/LN)
    lines_r = -(-counts // LN)
    cum = jnp.cumsum(lines_r)                      # inclusive
    starts = cum - lines_r                         # exclusive
    total_lines = cum[-1]
    count = counts.sum()

    # output line o -> source row r(o), line-within-row w(o)
    o = jnp.arange(KL, dtype=jnp.int32)
    r = jnp.searchsorted(cum, o, side="right").astype(jnp.int32)
    r = jnp.minimum(r, T - 1)
    w = o - starts[r]
    src_line = r * row_lines + w
    live = o < total_lines

    def gather_lines(x):
        g = jnp.take(x.reshape(T * row_lines, LN),
                     jnp.where(live, src_line, 0), axis=0)
        return g  # (KL, LN)

    g_mi = gather_lines(r_mi)
    g_j = gather_lines(r_j)

    # mask: entry e of line o is valid iff w*LN + lane < counts[r]
    lane = jnp.arange(LN, dtype=jnp.int32)[None, :]
    valid = live[:, None] & ((w[:, None] * LN + lane) < counts[r][:, None])
    vals = jnp.where(valid, g_mi, 0.0).reshape(-1)
    if r_wog is None:
        wogs = jnp.zeros_like(vals)
    else:
        wogs = jnp.where(valid, gather_lines(r_wog), 0.0).reshape(-1)
    joff = jnp.asarray(j_offset, jnp.int32)
    jpos = jnp.where(valid, g_j.astype(jnp.int32) + joff, 0).reshape(-1)
    ipos = jnp.where(valid, i0 + r[:, None], 0).reshape(-1)

    overflow = total_lines > KL
    count = jnp.where(overflow, jnp.int32(1 << 30), count)
    lines = jnp.minimum(total_lines, KL)
    return vals, wogs, ipos, jpos, count, lines
