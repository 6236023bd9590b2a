"""Integrated Pallas sweep path vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

from spydrpick_tpu.core.alignment import Alignment
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


def test_int8_unit_mode_bit_identical():
    """Unit weights auto-select the MXU int8 path (mxu_int8="auto"):
    0/1 int8 operands accumulate exact integer counts in int32, so the
    sweep is BIT-IDENTICAL to the bf16 single-pass kernel (both produce
    the same exact f32 crosstable)."""
    al = random_alignment(n_samples=40, n_loci=3 * BI, seed=81,
                          gap_frac=0.12)
    al.weights = None
    e_i8 = MIEngine(al, EngineConfig(tile=BI, use_pallas="on",
                                     wog_fetch="outliers"))
    assert e_i8.statics.int8_mode == "unit"
    assert e_i8.statics.storage_dtype == "int8"
    e_bf = MIEngine(al, EngineConfig(tile=BI, use_pallas="on",
                                     wog_fetch="outliers", mxu_int8="off"))
    assert e_bf.statics.int8_mode == "off"
    a = e_i8.sweep(0.03).sort_desc()
    b = e_bf.sweep(0.03).sort_desc()
    np.testing.assert_array_equal(a.ipos, b.ipos)
    np.testing.assert_array_equal(a.jpos, b.jpos)
    np.testing.assert_array_equal(a.mi, b.mi)
    np.testing.assert_array_equal(a.mi_wog, b.mi_wog)
    np.testing.assert_array_equal(a.colmax, b.colmax)


def test_int8_fixed14_accuracy_vs_oracle():
    """Weighted sweeps with bounded weight spread auto-select the
    fixed14 int8 split; its error against the f64 oracle must stay in
    the same class as the bf16 hi/lo split it replaces (measured: the
    f32 epilogue dominates both)."""
    from spydrpick_tpu.ops.reference import mi_matrix

    al = random_alignment(n_samples=40, n_loci=3 * BI, seed=81,
                          gap_frac=0.12)
    rng = np.random.default_rng(3)
    al.weights = rng.random(40) * 0.9 + 0.1   # spread 10 < 32 -> auto
    M = mi_matrix(al.codes, al.weights, al.state_presence)
    e_fx = MIEngine(al, EngineConfig(tile=BI, use_pallas="on",
                                     wog_fetch="outliers"))
    assert e_fx.statics.int8_mode == "fixed14"
    assert e_fx.statics.int8_scale > 16383.0  # 16383 / max_w, max_w < 1
    e_bw = MIEngine(al, EngineConfig(tile=BI, use_pallas="on",
                                     wog_fetch="outliers", mxu_int8="off"))
    fx = e_fx.sweep(0.02)
    bw = e_bw.sweep(0.02)
    err_fx = max(abs(m - M[i, j]) for i, j, m in zip(fx.ipos, fx.jpos, fx.mi))
    err_bw = max(abs(m - M[i, j]) for i, j, m in zip(bw.ipos, bw.jpos, bw.mi))
    assert err_fx < max(2.0 * err_bw, 5e-5), (err_fx, err_bw)
    # threshold-boundary flips only
    assert abs(fx.n_edges - bw.n_edges) <= max(2, bw.n_edges // 1000)


def test_int8_auto_gate_on_weight_spread():
    """Weight spread > 32 keeps the bf16 hi/lo split under "auto" (the
    fixed14 quantisation error grows with max_w/min_w); mxu_int8="on"
    forces fixed14 regardless."""
    al = random_alignment(n_samples=40, n_loci=2 * BI, seed=7, gap_frac=0.1)
    w = np.ones(40)
    w[0] = 1 / 64.0  # spread 64 > 32
    al.weights = w
    auto = MIEngine(al, EngineConfig(tile=BI, use_pallas="on"))
    assert auto.statics.int8_mode == "off"
    forced = MIEngine(al, EngineConfig(tile=BI, use_pallas="on",
                                       mxu_int8="on"))
    assert forced.statics.int8_mode == "fixed14"


def test_int8_fixed14_overflow_dual_consistency():
    """Overflowed rows re-extract through the DUAL kernel; under fixed14
    it must run the same int8 passes, so a capacity-starved sweep equals
    the roomy one bit for bit."""
    al = random_alignment(n_samples=40, n_loci=3 * BI, seed=19,
                          gap_frac=0.1)
    rng = np.random.default_rng(11)
    al.weights = rng.random(40) * 0.5 + 0.5
    roomy = MIEngine(al, EngineConfig(tile=BI, use_pallas="on",
                                      wog_fetch="outliers"))
    assert roomy.statics.int8_mode == "fixed14"
    tight = MIEngine(al, EngineConfig(tile=BI, use_pallas="on",
                                      wog_fetch="outliers",
                                      edge_capacity=4096))
    a = roomy.sweep(0.005).sort_desc()
    b = tight.sweep(0.005).sort_desc()
    assert a.n_edges == b.n_edges and a.n_edges > 4096  # overflow exercised
    np.testing.assert_array_equal(a.ipos, b.ipos)
    np.testing.assert_array_equal(a.jpos, b.jpos)
    np.testing.assert_array_equal(a.mi, b.mi)
    # (mi_wog is NOT compared: lazy mode defaults wog := mi except for
    # outlier candidates, while re-extracted overflow rows carry real
    # dual-kernel wog — a pre-existing semantic split, same under bf16;
    # the output surface only ever reads wog for outliers)


def test_int8_fixed14_exact_grid_weights():
    """Weights on the fixed-point grid (multiples of 1/16384 with
    max_w = 16383/16384, so q = 16384 and w_q = w*q exactly) make the
    fixed14 crosstable EXACT integer arithmetic — the error vs the f64
    oracle must then be pure f32-epilogue error, i.e. no worse than the
    bf16 hi/lo engine's on the same data."""
    from spydrpick_tpu.ops.reference import mi_matrix

    al = random_alignment(n_samples=48, n_loci=2 * BI, seed=23,
                          gap_frac=0.1)
    rng = np.random.default_rng(9)
    k = rng.integers(1024, 16384, size=48)   # spread 16 < 32 -> auto
    k[0] = 16383                             # pins max_w = 16383/16384
    al.weights = k / 16384.0
    M = mi_matrix(al.codes, al.weights, al.state_presence)
    e_fx = MIEngine(al, EngineConfig(tile=BI, use_pallas="on",
                                     wog_fetch="outliers"))
    assert e_fx.statics.int8_mode == "fixed14"
    assert abs(e_fx.statics.int8_scale - 16384.0) < 1e-9
    e_bw = MIEngine(al, EngineConfig(tile=BI, use_pallas="on",
                                     wog_fetch="outliers", mxu_int8="off"))
    fx = e_fx.sweep(0.02)
    bw = e_bw.sweep(0.02)
    err_fx = max(abs(m - M[i, j]) for i, j, m in zip(fx.ipos, fx.jpos, fx.mi))
    err_bw = max(abs(m - M[i, j]) for i, j, m in zip(bw.ipos, bw.jpos, bw.mi))
    # exact counts can only beat the bf16 split (tiny slack for epilogue
    # input rounding differences)
    assert err_fx <= err_bw * 1.2 + 1e-7, (err_fx, err_bw)


def test_int8_windowed_rows_bit_identical():
    """J-windowed sweeps compose with both int8 modes: window mode only
    re-tiles the work items, so results match full-width bit for bit."""
    al = random_alignment(n_samples=40, n_loci=4 * BI, seed=33,
                          gap_frac=0.1)
    rng = np.random.default_rng(2)
    al.weights = rng.random(40) * 0.9 + 0.1
    w = MIEngine(al, EngineConfig(tile=BI, use_pallas="on",
                                  wog_fetch="outliers", row_window=2 * BI))
    assert w.statics.row_window == 2 * BI
    assert w.statics.int8_mode == "fixed14"
    f = MIEngine(al, EngineConfig(tile=BI, use_pallas="on",
                                  wog_fetch="outliers", row_window=1))
    assert f.statics.row_window == 0 and f.statics.int8_mode == "fixed14"
    a = w.sweep(0.02).sort_desc()
    b = f.sweep(0.02).sort_desc()
    assert a.n_edges == b.n_edges
    np.testing.assert_array_equal(a.ipos, b.ipos)
    np.testing.assert_array_equal(a.jpos, b.jpos)
    np.testing.assert_array_equal(a.mi, b.mi)


def test_fixed14_sample_count_guard():
    """fixed14 must NOT be selected (even under --mxu-int8 on) when an
    int32 crosstable cell could wrap: sum(w_q) <= S*16383 needs S below
    ~131k samples.  Such runs fall back to the bf16 hi/lo path."""
    S, L = 140000, 32
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 5, size=(S, L)).astype(np.uint8)
    al = Alignment(
        codes=codes,
        sample_names=[f"s{i}" for i in range(S)],
        id_string="guard",
        translation=np.arange(L, dtype=np.int64),
        n_original_positions=L,
        weights=rng.random(S) * 0.9 + 0.1,
    )
    eng = MIEngine(al, EngineConfig(tile=8, use_pallas="on", mxu_int8="on"))
    assert eng.statics.int8_mode == "off"
    # a small-S twin with the same weights spread DOES select fixed14
    al_small = Alignment(
        codes=codes[:48],
        sample_names=[f"s{i}" for i in range(48)],
        id_string="guard-s",
        translation=np.arange(L, dtype=np.int64),
        n_original_positions=L,
        weights=(rng.random(48) * 0.9 + 0.1),
    )
    eng_s = MIEngine(al_small, EngineConfig(tile=8, use_pallas="on",
                                            mxu_int8="on"))
    assert eng_s.statics.int8_mode == "fixed14"
