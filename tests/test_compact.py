"""Unit tests for the edge-compaction paths (roll-routing vs XLA)."""

import numpy as np
import pytest


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


def test_route_pallas_vmem_width_guard(monkeypatch):
    """Widths whose minimum 8-row block exceeds the device's VMEM-scaled
    cap must (a) raise from a direct route_rows_pallas call and (b) be
    gated OUT of the default-on path in compact_edges_route."""
    import jax.numpy as jnp
    from spydrpick_tpu.ops import compact_route as cr

    monkeypatch.setattr(cr, "_route_block_cap_elems", lambda: 8 * 1024)
    mask = jnp.zeros((8, 2048), bool)
    mi = jnp.zeros((8, 2048), jnp.float32)
    with pytest.raises(ValueError, match="VMEM-safe cap"):
        cr.route_rows_pallas(mask, mi, interpret=False)
    # default gating falls back to the XLA route instead of raising
    monkeypatch.setenv("SPYDRPICK_PALLAS_ROUTE", "1")
    monkeypatch.setattr(cr.jax, "default_backend", lambda: "tpu")
    vals, wogs, ipos, jpos, count, lines = cr.compact_edges_route(
        mi, None, mask, 0, 2048
    )
    assert int(count) == 0  # reached the XLA path and compacted nothing


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
