"""ARACNE indirect-edge pruning (data-processing-inequality filter).

Reference: include/ARACNE.hpp (blocked, mutex-striped, TBB-parallel
streaming implementation).  We re-derived the algorithm's *semantics*
and found the block streaming is purely an execution strategy — the
final flag assignment is order-independent:

For each stored edge e = (a, b, w), over every common neighbour c of a
and b with edge weights w_ac and w_bc, let m_c = min(w_ac, w_bc). The
DPI rule (ARACNE.hpp:311-313: ``midval - minval >= threshold`` marks
the triangle's minimum-weight edges indirect) reduces per edge to:

    indirect(e)  <=>  max_c m_c  >=  w + max(threshold, 0)

Derivation: e is marked in triangle (e, ac, bc) iff w == min of the
three and mid - min >= threshold.  When w < m_c the mid is m_c, giving
``m_c - w >= threshold``; when w == m_c the mid equals w so the margin
is 0, which passes only for threshold <= 0.  Both cases collapse to
``m_c >= w + max(threshold, 0)``.  Every triangle of the graph is
examined by the reference exactly because its smallest in-block member
edge never trips the intra-block skip (ARACNE.hpp:358), and marking is
idempotent — hence the streamed result equals this closed form.
(The threshold==0 equal-MI block-boundary rewind at ARACNE.hpp:480-487
exists only to realise the same guarantee and needs no analogue here.)

Output polarity (ARACNE.hpp:399-405 + SpydrPick.hpp formatter): the
public flag is 1 for *direct* (surviving) edges, i.e. NOT indirect.
With --no-aracne the flag column is all zeros (SpydrPick.cpp:406-421).

Implementation: vectorised CSR adjacency + per-edge sorted-merge
intersection in NumPy, with an optional C++ kernel
(spydrpick_tpu/native) for large graphs.  The MI sweep dominates
wall-time; the graph here is <= ~1e7 edges.
"""

from __future__ import annotations

import numpy as np

DEFAULT_EDGE_THRESHOLD = float(np.finfo(np.float64).eps)


def _csr_adjacency(ipos, jpos, n_nodes):
    """Sorted-neighbour CSR over undirected edges; returns
    (indptr, neighbors, edge_ids) with neighbours ascending per node."""
    deg = np.bincount(ipos, minlength=n_nodes) + np.bincount(jpos, minlength=n_nodes)
    indptr = np.zeros(n_nodes + 1, dtype=np.int64)
    np.cumsum(deg, out=indptr[1:])
    E = len(ipos)
    # endpoints interleaved: for edge k, entries (ipos[k]->jpos[k]) and reverse
    src = np.concatenate([ipos, jpos])
    dst = np.concatenate([jpos, ipos])
    eid = np.concatenate([np.arange(E), np.arange(E)])
    order = np.lexsort((dst, src))
    return indptr, dst[order], eid[order]


def aracne_mark_indirect(
    ipos: np.ndarray,
    jpos: np.ndarray,
    mi: np.ndarray,
    threshold: float = DEFAULT_EDGE_THRESHOLD,
) -> np.ndarray:
    """(E,) bool: True where the edge is INDIRECT (to be pruned).

    Positions may be arbitrary node ids; they are densified internally
    (reference remap_and_initialize, ARACNE.hpp:50-88).
    """
    E = len(mi)
    if E == 0:
        return np.zeros(0, dtype=bool)
    nodes, inv = np.unique(np.concatenate([ipos, jpos]), return_inverse=True)
    a = inv[:E]
    b = inv[E:]
    n_nodes = len(nodes)
    indptr, nbr, eid = _csr_adjacency(a, b, n_nodes)
    w = np.asarray(mi, dtype=np.float64)
    margin = w + max(threshold, 0.0)

    indirect = np.zeros(E, dtype=bool)
    # Per-edge sorted-merge intersection of ne(a) and ne(b).
    # Grouped into batches by processing edges individually in NumPy via
    # searchsorted: for each edge, look up each neighbour of the smaller
    # endpoint in the larger endpoint's sorted neighbour list.
    for k in range(E):
        na0, na1 = indptr[a[k]], indptr[a[k] + 1]
        nb0, nb1 = indptr[b[k]], indptr[b[k] + 1]
        if na1 - na0 > nb1 - nb0:  # iterate over the smaller neighbourhood
            na0, na1, nb0, nb1 = nb0, nb1, na0, na1
        cand = nbr[na0:na1]
        cand_eid = eid[na0:na1]
        pos = np.searchsorted(nbr[nb0:nb1], cand)
        pos = np.clip(pos, 0, nb1 - nb0 - 1)
        hit = nbr[nb0:nb1][pos] == cand
        if not hit.any():
            continue
        e1 = cand_eid[hit]
        e2 = eid[nb0:nb1][pos[hit]]
        self_mask = (e1 != k) & (e2 != k)  # exclude the edge itself / endpoints
        if not self_mask.any():
            continue
        m = np.minimum(w[e1[self_mask]], w[e2[self_mask]])
        if m.max() >= margin[k]:
            indirect[k] = True
    return indirect


def run_aracne(
    ipos: np.ndarray,
    jpos: np.ndarray,
    mi: np.ndarray,
    threshold: float = DEFAULT_EDGE_THRESHOLD,
    use_native: bool = True,
) -> np.ndarray:
    """(E,) uint8 ARACNE flags: 1 = direct survivor, 0 = indirect.

    Entry point mirroring ``aracne::run_ARACNE`` (ARACNE.hpp:550-555).
    """
    if use_native:
        try:
            from spydrpick_tpu.native import aracne_native

            ind = aracne_native.mark_indirect(ipos, jpos, mi, threshold)
            return (~ind).astype(np.uint8)
        except Exception:
            pass  # fall back to NumPy
    return (~aracne_mark_indirect(ipos, jpos, mi, threshold)).astype(np.uint8)
