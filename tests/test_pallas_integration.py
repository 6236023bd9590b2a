"""Integrated Pallas sweep path vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

from spydrpick_tpu.engine.solver import EngineConfig, MIEngine
from spydrpick_tpu.ops.mi_pallas import BI

from tests.conftest import random_alignment


@pytest.mark.parametrize(
    "compact,n_loci",
    [("off", 2 * BI), ("on", 2 * BI), ("on", 8 * BI)],
    # 8*BI: Lp=1024 -> 2 compaction chunks per buffer row (nbj=2), which
    # exercises the write-order/overhang interaction the nbj=1 case hides
)
def test_pallas_sweep_matches_xla_path(compact, n_loci):
    al = random_alignment(n_samples=40, n_loci=n_loci, seed=60, gap_frac=0.15)
    xla = MIEngine(al, EngineConfig(tile=BI, use_pallas="off")).sweep(0.05).sort_desc()
    pls = (
        MIEngine(al, EngineConfig(tile=BI, use_pallas="on", use_pallas_compact=compact))
        .sweep(0.05)
        .sort_desc()
    )
    # bf16 hi/lo split tolerance near the threshold boundary
    assert abs(xla.n_edges - pls.n_edges) <= max(2, xla.n_edges // 200)
    both = set(zip(xla.ipos, xla.jpos)) & set(zip(pls.ipos, pls.jpos))
    xm = {(i, j): m for i, j, m in zip(xla.ipos, xla.jpos, xla.mi)}
    pm = {(i, j): m for i, j, m in zip(pls.ipos, pls.jpos, pls.mi)}
    for k in both:
        assert abs(xm[k] - pm[k]) < 3e-4, k
    np.testing.assert_allclose(xla.colmax, pls.colmax, atol=3e-4)


def test_pallas_unit_weights_single_pass():
    """Unit weights engage the single-pass kernel (no lo operand); with
    exact-bf16 0/1 operands the MI must EQUAL the XLA path's values."""
    al = random_alignment(n_samples=40, n_loci=2 * BI, seed=61, gap_frac=0.1)
    al.weights = None
    pls_engine = MIEngine(al, EngineConfig(tile=BI, use_pallas="on",
                                           wog_fetch="outliers"))
    assert pls_engine.statics.unit_weights
    xla = MIEngine(al, EngineConfig(tile=BI, use_pallas="off")).sweep(0.05).sort_desc()
    pls = pls_engine.sweep(0.05).sort_desc()
    # both paths see exact 0/1 bf16 operands; only f32 accumulation
    # structure differs (per-bs-block vs single dot) — boundary edges
    # may flip, interior values agree to ordering noise
    assert abs(xla.n_edges - pls.n_edges) <= 2
    xm = {(i, j): m for i, j, m in zip(xla.ipos, xla.jpos, xla.mi)}
    pm = {(i, j): m for i, j, m in zip(pls.ipos, pls.jpos, pls.mi)}
    for k in set(xm) & set(pm):
        assert abs(xm[k] - pm[k]) < 5e-5, k
    for k in set(xm) ^ set(pm):
        m = xm.get(k, pm.get(k))
        assert abs(m - 0.05) < 1e-4, (k, m)
