"""Pallas fused MI kernel vs the float64 oracle (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from spydrpick_tpu.core.alphabet import N_STATES
from spydrpick_tpu.ops.mi_pallas import (
    BI, BJ, BS, mi_tile_pallas, split_bf16, to_slab,
)
from spydrpick_tpu.ops.reference import crosstab_pair, mi_single

from tests.conftest import random_alignment


def _slab_presence(p):
    """(L, 5) presence -> slab-flattened (L*5,) f32 kernel operand."""
    return jnp.asarray(to_slab(p.astype(np.float32).reshape(-1), BI))


def _setup(n_samples=100, n_loci=BI, seed=4, gap_frac=0.25):
    al = random_alignment(n_samples=n_samples, n_loci=n_loci, seed=seed,
                          gap_frac=gap_frac)
    S, L = al.n_samples, al.n_loci
    Sp = -(-S // BS) * BS
    oh = np.zeros((Sp, L, N_STATES), dtype=np.float32)
    np.put_along_axis(oh[:S], al.codes[:, :, None].astype(np.int64), 1, axis=2)
    w = np.zeros(Sp)
    w[:S] = al.weights
    # kernels take slab-layout operands (ops/mi_pallas.to_slab)
    xi_w = to_slab((oh * w[:, None, None])
                   .reshape(Sp, L * N_STATES).astype(np.float32), BI)
    xj = to_slab(oh.reshape(Sp, L * N_STATES), BI)
    hi, lo = split_bf16(jnp.asarray(xi_w))
    return al, hi, lo, jnp.asarray(xj, jnp.bfloat16)


def test_pallas_kernel_matches_oracle():
    al, hi, lo, xj = _setup()
    ipf = _slab_presence(al.state_presence)
    ipwf = _slab_presence(al.state_presence_wo_gaps)
    mi, wog = mi_tile_pallas(hi, lo, xj, ipf, ipf, ipwf, ipwf,
                             pseudocount=0.5, interpret=True)
    mi = np.asarray(mi)
    wog = np.asarray(wog)
    L = al.n_loci
    for i in range(0, L, 7):
        for j in range(0, L, 11):
            if i == j:
                continue
            C = crosstab_pair(al.codes[:, i], al.codes[:, j], al.weights)
            want = mi_single(C, al.state_presence[i], al.state_presence[j], 0.5)
            want_w = mi_single(C, al.state_presence_wo_gaps[i],
                               al.state_presence_wo_gaps[j], 0.5)
            # bf16 hi/lo split: ~2^-16 relative count error -> ~1e-4 MI
            assert abs(mi[i, j] - want) < 3e-4, (i, j, mi[i, j], want)
            assert abs(wog[i, j] - want_w) < 3e-4, (i, j)


def test_pallas_kernel_multiblock_grid():
    """TI = 2*BI exercises the (i, j) grid and scratch revisiting."""
    al, hi, lo, xj = _setup(n_samples=60, n_loci=2 * BI, seed=9, gap_frac=0.1)
    ipf = _slab_presence(al.state_presence)
    ipwf = _slab_presence(al.state_presence_wo_gaps)
    mi, _ = mi_tile_pallas(hi, lo, xj, ipf, ipf, ipwf, ipwf, interpret=True)
    mi = np.asarray(mi)
    rng = np.random.default_rng(0)
    for _ in range(30):
        i, j = rng.integers(0, al.n_loci, 2)
        if i == j:
            continue
        C = crosstab_pair(al.codes[:, i], al.codes[:, j], al.weights)
        want = mi_single(C, al.state_presence[i], al.state_presence[j], 0.5)
        assert abs(mi[i, j] - want) < 3e-4, (i, j)


@pytest.mark.parametrize("n_blocks,n_k", [(1, 2), (2, 2), (2, 4), (2, 8)])
def test_single_kernel_schedules_bit_identical(n_blocks, n_k):
    """serial / defer are the SAME math on a moved schedule — results
    must be bit-identical, incl. single-block grids."""
    from spydrpick_tpu.ops.mi_pallas import mi_tile_pallas_single

    al, hi, lo, xj = _setup(n_samples=n_k * BS, n_loci=n_blocks * BI,
                            seed=7, gap_frac=0.2)
    ipf = _slab_presence(al.state_presence)
    run = lambda sched: np.asarray(mi_tile_pallas_single(
        hi, lo, xj, ipf, ipf, interpret=True, schedule=sched))
    serial = run("serial")
    assert np.isfinite(serial).all()
    np.testing.assert_array_equal(serial, run("defer"))


def test_split_bf16_accuracy():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random(10000).astype(np.float32))
    hi, lo = split_bf16(x)
    recon = hi.astype(jnp.float32) + lo.astype(jnp.float32)
    rel = np.abs(np.asarray(recon - x)) / np.asarray(x)
    assert rel.max() < 2e-5


def test_unknown_schedule_rejected():
    """A typo'd schedule must raise, not silently degrade to serial."""
    import numpy as np
    import pytest

    from spydrpick_tpu.ops.mi_pallas import BI, BS, mi_tile_pallas_single

    S, T = BS, BI
    xi = np.zeros((S, T * 5), np.float32).astype("bfloat16")
    pf = np.ones(T * 5, np.float32)
    with pytest.raises(ValueError, match="unknown pallas schedule"):
        mi_tile_pallas_single(xi, xi, xi, pf, pf, schedule="deferred")
