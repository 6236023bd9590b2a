"""Unit tests for the edge-compaction paths.

The round-1 regression being locked down: the Pallas compaction used to
return the 128-aligned staging extent as the edge count, so at ~1 edge
per chunk-row every block-row looked overflowed (count ~100x reality)
and the sweep silently degraded to full-row host re-extraction.  The
repacked kernel must return a TRUE count and a dense edge window.
"""

import numpy as np
import pytest

from spydrpick_tpu.ops.compact_pallas import compact_edges_pallas


def _reference(mi, wog, i0, threshold, L):
    T, Lp = mi.shape
    jg, ig = np.meshgrid(np.arange(Lp), i0 + np.arange(T))
    mask = (mi > threshold) & (jg > ig) & (jg < L) & (ig < L)
    ii, jj = np.nonzero(mask)
    return mi[mask], wog[mask], (i0 + ii).astype(np.int64), jj.astype(np.int64)


@pytest.mark.parametrize("density", [0.0, 0.001, 0.05, 0.5])
def test_repack_true_count_and_dense_edges(density):
    rng = np.random.default_rng(int(density * 1000) + 7)
    T, Lp, L, i0 = 16, 1024, 1000, 0
    mi = rng.random((T, Lp)).astype(np.float32)
    wog = (mi * 0.5).astype(np.float32)
    threshold = np.float32(1.0 - density)
    K = 1 << 14

    vals, wogs, ipos, jpos, count = map(
        np.asarray,
        compact_edges_pallas(mi, wog, i0, threshold, L, K, interpret=True),
    )
    rm, rw, ri, rj = _reference(mi, wog, i0, threshold, L)
    assert int(count) == len(rm)
    n = int(count)
    # dense: the first `count` slots are exactly the edges (row-major
    # order within a chunk; chunks in row-major order) — sort both sides
    got = sorted(zip(ipos[:n], jpos[:n], vals[:n], wogs[:n]))
    exp = sorted(zip(ri, rj, rm, rw))
    for g, e in zip(got, exp):
        assert g[0] == e[0] and g[1] == e[1]
        assert abs(g[2] - e[2]) < 2e-6 and abs(g[3] - e[3]) < 2e-6
    # no stray entries past the count
    assert np.all(vals[n:] == 0.0) and np.all(jpos[n:] == 0)


def test_repack_count_exceeding_capacity_reports_overflow():
    rng = np.random.default_rng(3)
    T, Lp, K = 16, 1024, 256
    mi = rng.random((T, Lp)).astype(np.float32)
    wog = mi.copy()
    # ~10% density: extent fits the staging buffer but count >> K
    vals, wogs, ipos, jpos, count = map(
        np.asarray,
        compact_edges_pallas(mi, wog, 0, np.float32(0.9), Lp, K, interpret=True),
    )
    rm, _, _, _ = _reference(mi, wog, 0, 0.9, Lp)
    assert int(count) == len(rm) > K  # true count signals overflow
    # the window still holds valid leading edges
    assert np.all(jpos[: K] > ipos[: K]) or np.all(vals == 0)


def test_repack_poisons_when_staging_buffer_clamps():
    rng = np.random.default_rng(4)
    T, Lp, K = 16, 1024, 256
    mi = rng.random((T, Lp)).astype(np.float32)
    wog = mi.copy()
    # full density: aligned extent exceeds the staging buffer sized for
    # K=256 -> the row must be poisoned (count > K, outputs zeroed) so
    # the caller's overflow path re-extracts it on the host
    vals, wogs, ipos, jpos, count = map(
        np.asarray,
        compact_edges_pallas(mi, wog, 0, np.float32(-1.0), Lp, K, interpret=True),
    )
    assert int(count) > K
    if int(count) == 1 << 30:  # poisoned: nothing may masquerade as an edge
        assert np.all(vals == 0) and np.all(jpos == 0)


@pytest.mark.parametrize("with_wog", [False, True])
@pytest.mark.parametrize("density", [0.0, 0.01, 0.3, 1.0])
def test_route_pallas_matches_xla(density, with_wog):
    """The VMEM-resident Pallas routing must produce the bit-identical
    store window as the XLA roll/select routing, on both payload
    configurations (lazy mi-only and dual mi+wog)."""
    import jax.numpy as jnp
    from spydrpick_tpu.ops.compact_route import compact_edges_route

    rng = np.random.default_rng(int(density * 100) + 3 + with_wog)
    T, Lp, i0, K = 16, 1024, 0, 2048
    mi = jnp.asarray(rng.random((T, Lp)).astype(np.float32))
    wog = jnp.asarray((np.asarray(mi) * 0.5).astype(np.float32)) if with_wog else None
    mask = jnp.asarray(rng.random((T, Lp)) < density)
    a = compact_edges_route(mi, wog, mask, i0, K, j_offset=128,
                            pallas_route=False)
    b = compact_edges_route(mi, wog, mask, i0, K, j_offset=128,
                            pallas_route=True)
    for x, y, name in zip(a, b, ("vals", "wogs", "ipos", "jpos", "count",
                                 "lines")):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=name)


def test_route_pallas_integrated_sweep(monkeypatch):
    """The full engine sweep with the Pallas routing forced (interpret
    mode) must equal the default XLA-routed sweep exactly."""
    from spydrpick_tpu.engine.solver import EngineConfig, MIEngine
    from tests.conftest import random_alignment

    al = random_alignment(n_samples=40, n_loci=256, seed=71, gap_frac=0.1)
    ref = MIEngine(al, EngineConfig(tile=32)).sweep(0.02).sort_desc()
    monkeypatch.setenv("SPYDRPICK_PALLAS_ROUTE", "force")
    got = MIEngine(al, EngineConfig(tile=32)).sweep(0.02).sort_desc()
    np.testing.assert_array_equal(ref.ipos, got.ipos)
    np.testing.assert_array_equal(ref.jpos, got.jpos)
    np.testing.assert_array_equal(ref.mi, got.mi)
    np.testing.assert_array_equal(ref.mi_wog, got.mi_wog)
