"""Hand-derived analytic parity fixtures.

Every expected value in this file is computed BY HAND from the
reference semantics (include/mi.hpp:146-181, ARACNE.hpp:311-321,480-487)
as literal arithmetic — independently of ops/reference.py — so the
oracle itself, the XLA path, and the Pallas path are all pinned to the
same externally-derived numbers.

Derivations are written out per fixture.  Notation: pc = pseudocount,
A = counts + pc on presence-masked cells, Z = masked sum of A,
MI = jointH - icondH - jcondH with icondH using the FULL row sum over
all i-states (the mi.hpp:173 SIMD-row quirk, live only when the
presence masks exclude states that still hold raw counts — i.e. the
gap-excluded re-evaluation, mi.hpp:466-490).
"""

import math

import numpy as np
import pytest

from spydrpick_tpu.core.alignment import Alignment
from spydrpick_tpu.engine.solver import EngineConfig, MIEngine

xlx = lambda p: p * math.log(p)


def _align(cols, weights=None):
    codes = np.array(cols, dtype=np.uint8).T.copy()
    return Alignment(
        codes=codes,
        sample_names=[f"s{i}" for i in range(codes.shape[0])],
        id_string="analytic",
        translation=np.arange(codes.shape[1], dtype=np.int64),
        n_original_positions=codes.shape[1],
        weights=weights,
    )


# --------------------------------------------------------------------- #
# Fixture A — gap-exclusion full-row-sum quirk, unit weights.
#
# col_i = [0, 0, 4, 4], col_j = [1, 4, 1, 4] (4 = gap), w = 1, pc = 0.5.
# Counts: C[0,1] = C[0,4] = C[4,1] = C[4,4] = 1.
#
# WITH gaps (ip = {0,4}, jp = {1,4}): A = 1.5 on the four cells, Z = 6,
# every P = 1/4; columns are independent so
#   MI = ln(1/4) - ln(1/2) - ln(1/2) = 0            (exactly)
#
# WITHOUT gaps (ipw = {0}, jpw = {1}): the crosstable is REUSED with the
# gap bit cleared (mi.hpp:123-129,472).  pm covers only cell (0,1):
# A[0,1] = 1.5, Z = 1.5, P[0,1] = 1 -> jointH = 0; jcondH = xlogx(1) = 0.
# icondH uses the FULL column sum over all i-states (mi.hpp:173):
# A[4,1] = C[4,1] = 1 (raw count, no pc — outside pm), so
#   amarg = (1.5 + 1) / 1.5 = 5/3,  icondH = (5/3)·ln(5/3)
#   MI_wog = -(5/3)·ln(5/3) ≈ -0.851375...
# (a masked marginal would give icondH = 0 and MI_wog = 0 — this fixture
# fails loudly if the quirk is ever "fixed")
# --------------------------------------------------------------------- #
A_COL_I = [0, 0, 4, 4]
A_COL_J = [1, 4, 1, 4]
A_MI = 0.0
A_MI_WOG = -(5.0 / 3.0) * math.log(5.0 / 3.0)


# --------------------------------------------------------------------- #
# Fixture B — the same quirk with non-trivial weights w = [2, 1, 1, 4].
#
# Counts: C[0,1] = 2, C[0,4] = 1, C[4,1] = 1, C[4,4] = 4.
# WITH gaps: A = [[2.5, 1.5], [1.5, 4.5]] on ({0,4} x {1,4}), Z = 10:
#   jointH = xlx(.25) + xlx(.15) + xlx(.15) + xlx(.45)
#   icondH = xlx(.40) + xlx(.60)   (column sums 4/10, 6/10)
#   jcondH = xlx(.40) + xlx(.60)   (row sums    4/10, 6/10)
# WITHOUT gaps: pm = {(0,1)}, A[0,1] = 2.5, Z = 2.5, P = 1:
#   jointH = 0, jcondH = 0,
#   icondH = xlogx((2.5 + C[4,1]) / 2.5) = xlx(1.4)
#   MI_wog = -1.4·ln(1.4)
# --------------------------------------------------------------------- #
B_W = [2.0, 1.0, 1.0, 4.0]
B_MI = (xlx(0.25) + xlx(0.15) + xlx(0.15) + xlx(0.45)) \
    - (xlx(0.4) + xlx(0.6)) - (xlx(0.4) + xlx(0.6))
B_MI_WOG = -1.4 * math.log(1.4)


# --------------------------------------------------------------------- #
# Fixture C — duplicated gap-free column (MI ~ column entropy).
#
# col = [0, 0, 1, 1] twice, w = 1, pc = 0.5.  C = diag(2, 2) on {0,1}:
# A = [[2.5, .5], [.5, 2.5]], Z = 6; marginals all 3/6 = 1/2:
#   MI = xlx(2.5/6)·2 + xlx(0.5/6)·2 - 4·xlx(1/2)
# No gaps anywhere -> mi_wog must EQUAL mi (the formatter default,
# SpydrPick.hpp:106-107).
# --------------------------------------------------------------------- #
C_MI = 2 * xlx(2.5 / 6) + 2 * xlx(0.5 / 6) - 4 * xlx(0.5)


@pytest.mark.parametrize(
    "cols,weights,exp_mi,exp_wog",
    [
        ([A_COL_I, A_COL_J], None, A_MI, A_MI_WOG),
        ([A_COL_I, A_COL_J], B_W, B_MI, B_MI_WOG),
        ([[0, 0, 1, 1], [0, 0, 1, 1]], None, C_MI, C_MI),
    ],
    ids=["quirk-unit", "quirk-weighted", "dup-column"],
)
def test_hand_derived_mi_all_paths(cols, weights, exp_mi, exp_wog):
    """Oracle, XLA batch kernel, and the engine sweep must all hit the
    hand-derived numbers."""
    from spydrpick_tpu.ops.mi import mi_from_crosstabs
    from spydrpick_tpu.ops.reference import crosstab_pair, mi_single

    al = _align(cols, None if weights is None else np.asarray(weights))
    w = np.ones(4) if weights is None else np.asarray(weights, np.float64)

    # 1. f64 oracle (ops/reference.py) against the hand value
    C = crosstab_pair(al.codes[:, 0], al.codes[:, 1], w)
    ip, jp = al.state_presence[0], al.state_presence[1]
    ipw, jpw = al.state_presence_wo_gaps[0], al.state_presence_wo_gaps[1]
    assert mi_single(C, ip, jp, 0.5) == pytest.approx(exp_mi, abs=1e-12)
    assert mi_single(C, ipw, jpw, 0.5) == pytest.approx(exp_wog, abs=1e-12)

    # 2. the vectorised XLA crosstable math (f32 — x64 stays off here)
    got = np.asarray(mi_from_crosstabs(
        C[None], ip[None].astype(np.float64), jp[None].astype(np.float64),
        0.5))
    assert got[0] == pytest.approx(exp_mi, abs=2e-6)

    # 3. the production engine sweep (f32): both stored variants
    eng = MIEngine(al, EngineConfig(tile=8, wog_fetch="full"))
    edges = eng.sweep(-10.0)
    k = {(i, j): (m, wg) for i, j, m, wg in
         zip(edges.ipos, edges.jpos, edges.mi, edges.mi_wog)}
    m, wg = k[(0, 1)]
    assert m == pytest.approx(exp_mi, abs=2e-6)
    assert wg == pytest.approx(exp_wog, abs=2e-6)


def test_hand_derived_mi_pallas_kernel():
    """The fused Pallas kernel (interpret mode off-TPU) hits the same
    hand-derived quirk numbers (fixture A embedded in a 128-wide tile)."""
    from spydrpick_tpu.ops.mi_pallas import BI

    cols = [A_COL_I, A_COL_J] + [[0, 1, 0, 1]] * (2 * BI - 2)
    al = _align(cols)
    eng = MIEngine(al, EngineConfig(tile=BI, use_pallas="on",
                                    wog_fetch="full"))
    assert eng.statics.use_pallas
    edges = eng.sweep(-10.0)
    k = {(i, j): (m, wg) for i, j, m, wg in
         zip(edges.ipos, edges.jpos, edges.mi, edges.mi_wog)}
    m, wg = k[(0, 1)]
    assert m == pytest.approx(A_MI, abs=5e-5)
    assert wg == pytest.approx(A_MI_WOG, abs=5e-5)


# --------------------------------------------------------------------- #
# Weighted tournament: determine_mi_threshold vs an independent
# from-scratch reimplementation (sampling replicated seed-for-seed;
# per-pair MI computed with the formula hand-written below, f64).
# --------------------------------------------------------------------- #

def _mi_pair_independent(ci, cj, w, pc=0.5):
    """Hand-written mi.hpp:146-181 (full-row-sum icondH), no imports
    from the package's math modules."""
    C = np.zeros((5, 5))
    for a, b, ww in zip(ci, cj, w):
        C[a, b] += ww
    ip = np.zeros(5, bool)
    ip[np.unique(ci)] = True
    jp = np.zeros(5, bool)
    jp[np.unique(cj)] = True
    pm = np.outer(ip, jp)
    A = C + pc * pm
    Z = A[pm].sum()
    P = A / Z
    f = lambda x: x * np.log(x) if x > 0 else 0.0
    jointH = sum(f(P[a, b]) for a in range(5) for b in range(5) if pm[a, b])
    icondH = sum(f(P[:, b].sum()) for b in range(5) if jp[b])  # FULL column
    jcondH = sum(f(P[a, jp].sum()) for a in range(5) if ip[a])
    return jointH - icondH - jcondH


def test_weighted_tournament_matches_independent_estimator():
    from spydrpick_tpu.engine.threshold import (
        determine_mi_threshold,
        determine_threshold_pairs,
        sample_pairs,
    )

    rng0 = np.random.default_rng(11)
    S, L = 30, 60
    codes = rng0.integers(0, 4, size=(S, L)).astype(np.uint8)
    codes[rng0.random((S, L)) < 0.1] = 4
    w = rng0.random(S) * 2 + 0.25
    al = _align(codes.T.tolist(), weights=w)
    eng = MIEngine(al, EngineConfig(tile=8))

    n_values, iters, seed, req_pairs = 40, 3, 7, 120
    got = determine_mi_threshold(eng, n_values, threshold_pairs=req_pairs,
                                 iterations=iters, seed=seed)

    # independent replication (same published sampling contract)
    possible = L * (L - 1) // 2
    percentile = 1.0 - n_values / possible
    pairs_n = determine_threshold_pairs(req_pairs, possible, percentile)
    idx = min(int(percentile * pairs_n), pairs_n - 1)
    rng = np.random.default_rng(seed)
    ests = []
    for _ in range(iters):
        ii, jj = sample_pairs(rng, pairs_n, L)
        vals = np.array([
            _mi_pair_independent(codes[:, i], codes[:, j], w)
            for i, j in zip(ii, jj)
        ])
        ests.append(np.sort(vals)[idx])
    ests = np.asarray(ests)
    exp = np.sort(ests)[len(ests) // 2 - (0 if len(ests) % 2 else 1)]
    assert got == pytest.approx(exp, abs=5e-6)  # engine evaluates in f32


# --------------------------------------------------------------------- #
# ARACNE tie semantics (ARACNE.hpp:311-321 rule, 480-487 tie rewind).
# --------------------------------------------------------------------- #

@pytest.mark.parametrize("use_native", [False, True])
def test_aracne_equal_triangle_threshold_zero(use_native):
    """Equal-MI triangle at threshold 0: every edge is the minimum of
    its triangle with margin 0, which passes ``mid - min >= 0`` — all
    three marked indirect (flags 0).  At any positive threshold the
    margin fails — all direct.  This is the exact case the reference's
    equal-MI block-boundary rewind exists to get right."""
    from spydrpick_tpu.engine.aracne import run_aracne

    i = np.array([0, 0, 1])
    j = np.array([1, 2, 2])
    w = np.array([0.7, 0.7, 0.7])
    assert run_aracne(i, j, w, threshold=0.0,
                      use_native=use_native).tolist() == [0, 0, 0]
    assert run_aracne(i, j, w, threshold=1e-15,
                      use_native=use_native).tolist() == [1, 1, 1]


@pytest.mark.parametrize("use_native", [False, True])
def test_aracne_tie_run_order_independent(use_native):
    """Flags must not depend on the order of edges within an equal-MI
    run (the reference guarantees this by rewinding block starts over
    ties, ARACNE.hpp:480-487; the closed form is order-free by
    construction).  Mixed graph: a tied triangle chained to a strictly
    weaker edge."""
    from spydrpick_tpu.engine.aracne import run_aracne

    # triangle (0,1,2) all at 0.5; edge (2,3) at 0.5 (same run, no
    # triangle); edge (0,3) at 0.2 -> triangle (0,2,3) has min 0.2
    i = np.array([0, 0, 1, 2, 0])
    j = np.array([1, 2, 2, 3, 3])
    w = np.array([0.5, 0.5, 0.5, 0.5, 0.2])
    base = None
    for perm_seed in range(4):
        order = np.random.default_rng(perm_seed).permutation(len(w))
        flags = run_aracne(i[order], j[order], w[order], threshold=0.0,
                           use_native=use_native)
        keyed = {(a, b): f for a, b, f in zip(i[order], j[order], flags)}
        if base is None:
            base = keyed
        assert keyed == base
    # hand check: triangle edges all indirect (tie at thr 0); (2,3) has
    # common neighbour 0 with min(w02, w03) = 0.2 < 0.5 -> direct;
    # (0,3)'s triangle min is itself with margin 0.3 >= 0 -> indirect
    assert base == {(0, 1): 0, (0, 2): 0, (1, 2): 0, (2, 3): 1, (0, 3): 0}


@pytest.mark.parametrize("use_native", [False, True])
def test_aracne_tie_straddling_reference_block_boundary(use_native):
    """The reference streams edges in 16384-edge blocks and rewinds the
    block start over an equal-MI run crossing the boundary
    (ARACNE.hpp:480-487).  Build a graph whose tied run would straddle
    that boundary and check the closed form treats every tied triangle
    alike regardless of position in the sorted stream."""
    from spydrpick_tpu.engine.aracne import run_aracne

    rng = np.random.default_rng(5)
    # filler: a long descending run of isolated (triangle-free) edges
    n_fill = 16384
    fi = np.arange(n_fill) * 2 + 100
    fj = fi + 1
    fw = np.linspace(0.9, 0.61, n_fill)
    # the tied run at 0.6 crossing the 16384 boundary: K disjoint
    # triangles, all edges tied
    K = 6
    ti, tj, tw = [], [], []
    for t in range(K):
        a = 50_000 + 3 * t
        ti += [a, a, a + 1]
        tj += [a + 1, a + 2, a + 2]
        tw += [0.6, 0.6, 0.6]
    i = np.concatenate([fi, ti])
    j = np.concatenate([fj, tj])
    w = np.concatenate([fw, tw])
    order = np.argsort(-w, kind="stable")
    flags = run_aracne(i[order], j[order], w[order], threshold=0.0,
                       use_native=use_native)
    keyed = {(a, b): f for a, b, f in zip(i[order], j[order], flags)}
    for t in range(K):  # every tied triangle fully indirect
        a = 50_000 + 3 * t
        assert keyed[(a, a + 1)] == 0
        assert keyed[(a, a + 2)] == 0
        assert keyed[(a + 1, a + 2)] == 0
    assert all(keyed[(a, b)] == 1 for a, b in zip(fi, fj))  # fillers direct
