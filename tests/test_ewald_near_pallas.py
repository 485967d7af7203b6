"""Cell-pair near-field kernel: plan binning, XLA↔legacy↔Pallas parity,
overflow accounting.

The plan-based evaluation must reproduce the legacy per-target cell-list
sum (`ewald._near_apply`), and the Pallas kernel (interpret mode on CPU)
must match the XLA cell-pair oracle at f32 tolerance — mirroring the
reference's GPU-vs-CPU kernel parity discipline (tests/core/kernel_test.cpp).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from skellysim_tpu.kernels import ewald
from skellysim_tpu.kernels import ewald_near_pallas as enp

RNG = np.random.default_rng(1229)


def _setup(n_src=400, n_trg=300, a=0.22, cap=64, cap_t=64, span=2.0):
    r_src = jnp.asarray(RNG.uniform(0, span, (n_src, 3)))
    r_trg = jnp.asarray(RNG.uniform(0, span, (n_trg, 3)))
    r_cut = 3.5 * a
    lo = np.asarray([-2 * r_cut] * 3)
    n_cells = tuple(int(np.ceil((span + 4 * r_cut) / r_cut)) for _ in range(3))
    plan = enp.make_plan(r_src, r_trg, jnp.asarray(lo), r_cut, n_cells,
                         cap, cap_t)
    return r_src, r_trg, lo, r_cut, n_cells, plan, a


def test_plan_no_overflow_and_inverse_map():
    r_src, r_trg, lo, cell, n_cells, plan, a = _setup()
    assert int(plan.dropped) == 0
    # inverse map: every target recovers its own position from the stores
    back = enp.unbin_targets(plan, plan.tcell_r)
    np.testing.assert_allclose(np.asarray(back), np.asarray(r_trg), rtol=0,
                               atol=0)


def test_plan_xla_matches_legacy_stokeslet():
    r_src, r_trg, lo, cell, n_cells, plan, a = _setup()
    f = jnp.asarray(RNG.normal(size=(r_src.shape[0], 3)))
    want = np.asarray(ewald._near_apply(r_src, f, r_trg, jnp.asarray(lo),
                                        cell, n_cells, 64, a))
    got = np.asarray(enp.near_apply_plan(plan, f, a, kind="stokeslet",
                                         use_pallas=False))
    np.testing.assert_allclose(got, want, rtol=0,
                               atol=1e-12 * np.abs(want).max())


def test_plan_xla_matches_legacy_stresslet():
    r_src, r_trg, lo, cell, n_cells, plan, a = _setup()
    S = jnp.asarray(RNG.normal(size=(r_src.shape[0], 9)))
    want = np.asarray(ewald._near_apply(r_src, S, r_trg, jnp.asarray(lo),
                                        cell, n_cells, 64, a,
                                        kernel="stresslet"))
    got = np.asarray(enp.near_apply_plan(plan, S, a, kind="stresslet",
                                         use_pallas=False))
    np.testing.assert_allclose(got, want, rtol=0,
                               atol=1e-12 * np.abs(want).max())


def test_plan_self_targets_coincident_correction():
    """sources == targets: the −f_far(0) self correction must appear exactly
    once per point (the r = 0 slot of its own cell)."""
    a = 0.25
    r = jnp.asarray(RNG.uniform(0, 1.5, (200, 3)))
    f = jnp.asarray(RNG.normal(size=(200, 3)))
    r_cut = 3.5 * a
    lo = jnp.asarray([-2 * r_cut] * 3)
    n_cells = tuple(int(np.ceil((1.5 + 4 * r_cut) / r_cut)) for _ in range(3))
    plan = enp.make_plan(r, r, lo, r_cut, n_cells, 64, 64)
    want = np.asarray(ewald._near_apply(r, f, r, lo, r_cut, n_cells, 64, a))
    got = np.asarray(enp.near_apply_plan(plan, f, a, use_pallas=False))
    np.testing.assert_allclose(got, want, atol=1e-12 * np.abs(want).max())


@pytest.mark.parametrize("kind,K", [("stokeslet", 3), ("stresslet", 9)])
def test_pallas_matches_xla(kind, K):
    r_src, r_trg, lo, cell, n_cells, plan, a = _setup()
    pay = jnp.asarray(RNG.normal(size=(r_src.shape[0], K)))
    want = np.asarray(enp.near_apply_plan(plan, pay, a, kind=kind,
                                          use_pallas=False))
    got = np.asarray(enp.near_apply_plan(plan, pay, a, kind=kind,
                                         use_pallas=True, interpret=True))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=3e-5 * scale)


def test_overflow_is_counted_not_silent():
    """Overcrowding one cell must be REPORTED via plan.dropped — the failure
    mode the reference's FMM cannot have (VERDICT missing #3)."""
    a = 0.2
    r_cut = 3.5 * a
    # 100 sources inside ONE cell, capacity 64 → 36 dropped
    cluster = jnp.asarray(RNG.uniform(0.0, 0.1, (100, 3)))
    trg = jnp.asarray(RNG.uniform(0, 1.0, (50, 3)))
    lo = jnp.asarray([-2 * r_cut] * 3)
    n_cells = tuple(int(np.ceil((1.0 + 4 * r_cut) / r_cut)) for _ in range(3))
    plan = enp.make_plan(cluster, trg, lo, r_cut, n_cells, 64, 64)
    assert int(plan.dropped) == 36
    # target overflow counts too
    plan2 = enp.make_plan(trg, cluster, lo, r_cut, n_cells, 64, 64)
    assert int(plan2.dropped) == 36
    # and with enough capacity the count is zero
    plan3 = enp.make_plan(cluster, trg, lo, r_cut, n_cells, 128, 64)
    assert int(plan3.dropped) == 0


def test_slab_dropped_counts():
    pts = jnp.asarray(np.concatenate([
        RNG.uniform(0, 1, (50, 3)),
        np.tile([[0.5, 0.5, 0.5]], (40, 1)) + RNG.uniform(0, 1e-3, (40, 3)),
    ]))
    lo = jnp.asarray([0.0, 0.0, 0.0])
    h = 0.1
    dropped = ewald.slab_dropped(pts, lo, h, 11, cap=16)
    # slab 5 holds ≥40 points; exact count from the binning itself
    key = np.clip(np.floor(np.asarray(pts[:, 0]) / h + 0.5).astype(int), 0, 10)
    want = sum(max(0, c - 16) for c in np.bincount(key, minlength=11))
    assert int(dropped) == want > 0


def test_evaluator_apply_uses_plan_path():
    """EwaldStokeslet.apply end-to-end still matches the dense evaluator
    after the near field moved to the plan path."""
    from skellysim_tpu.kernels.reference import stokeslet_apply

    rng = np.random.default_rng(17)
    N = 300
    pts = jnp.asarray(rng.uniform(0, 2.0, (N, 3)))
    f = jnp.asarray(rng.normal(size=(N, 3)))
    ew = ewald.EwaldStokeslet(lo=[0, 0, 0], hi=[2, 2, 2], a=0.25,
                              dtype=jnp.float64, cap=256)
    got = np.asarray(ew.apply(pts, f, pts, 0.7))
    want = np.asarray(stokeslet_apply(pts, f, pts, 0.7))
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-4
