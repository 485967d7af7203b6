"""End-to-end: the spectral-Ewald pair evaluator drives the coupled solve.

The "ewald" pair_evaluator slot is this framework's FMM stand-in (the
reference selects FMM evaluators the same way: system.cpp / config
pair_evaluator). Parity gate: one implicit timestep of an interacting
multi-fiber system must match the dense "direct" evaluator to the
evaluator's accuracy class.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from skellysim_tpu.config import Config, Fiber, Params, perturbed_fiber_positions
from skellysim_tpu.system.system import System


def _build(pair_evaluator, hybrid=False):
    # hybrid=False by default: these systems are tiny, so the production
    # cost-model (params.ewald_hybrid) would route every coupling to the
    # dense kernels and the spectral path would never be exercised
    rng = np.random.default_rng(5)
    fibers = []
    for i in range(6):
        base = np.array([np.cos(i), np.sin(i), 0.1 * i])
        x = perturbed_fiber_positions(0.02, 1.0, base, [0.0, 0.0, 1.0], 16,
                                      rng=rng)
        fibers.append(Fiber(n_nodes=16, length=1.0, bending_rigidity=0.01,
                            radius=0.0125, x=x.ravel().tolist()))
    cfg = Config(params=Params(eta=1.0, dt_initial=5e-3, gmres_tol=1e-10,
                               pair_evaluator=pair_evaluator,
                               ewald_points_per_a=3.0,
                               ewald_hybrid=hybrid),
                 fibers=fibers)
    return System(cfg.to_dict())


def test_ewald_evaluator_step_matches_direct():
    s_direct = _build("direct")
    s_ewald = _build("ewald")
    r_d = s_direct.step()
    r_e = s_ewald.step()
    x_d = np.concatenate([np.asarray(b.x).ravel()
                          for b in s_direct.fibers.blocks])
    x_e = np.concatenate([np.asarray(b.x).ravel()
                          for b in s_ewald.fibers.blocks])
    assert np.abs(x_d - x_e).max() < 1e-6
    assert bool(r_d[1]) and bool(r_e[1])


def test_ewald_overflow_triggers_regrow_not_silence():
    """Undersized capacities must be detected and regrown during step(),
    and the regrown step must still match the dense evaluator — the
    anti-silent-corruption gate (VERDICT missing #3)."""
    s = _build("ewald")
    stk, st = s._ewald_objects()
    # sabotage: shrink capacities far below the real occupancy
    for ev in (stk, st):
        ev.slab_cap = 8
        ev.pair_total = 4
    caps_before = (stk.pair_total, stk.slab_cap)
    s._step_fn = s._build_step_fn()
    r = s.step()
    assert bool(r[1])
    assert (stk.pair_total, stk.slab_cap) > caps_before

    s_direct = _build("direct")
    s_direct.step()
    x_d = np.concatenate([np.asarray(b.x).ravel()
                          for b in s_direct.fibers.blocks])
    x_e = np.concatenate([np.asarray(b.x).ravel()
                          for b in s.fibers.blocks])
    assert np.abs(x_d - x_e).max() < 1e-6


def test_ewald_hybrid_routes_small_couplings_dense():
    """With the production cost model on, a tiny system's couplings all fall
    below the cutoff — the step must route them through the dense kernels
    (no plans, no overflow counting) and still match "direct" exactly."""
    s_direct = _build("direct")
    s_hybrid = _build("ewald", hybrid=True)
    s_direct.step()
    r = s_hybrid.step()
    assert bool(r[1])
    x_d = np.concatenate([np.asarray(b.x).ravel()
                          for b in s_direct.fibers.blocks])
    x_h = np.concatenate([np.asarray(b.x).ravel()
                          for b in s_hybrid.fibers.blocks])
    # dense tier in f64 == the direct evaluator bit-for-bit
    assert np.abs(x_d - x_h).max() == 0.0


def test_tol_aware_evaluator_knobs():
    """At gmres_tol >= 1e-4 the System picks the loose-regime near cutoff
    (3.0a) and spread support (7); tighter tolerances keep the accurate
    defaults (3.5a, 9). Explicit params override."""
    s_loose = _build("ewald")            # gmres_tol raised below
    s_loose.params.gmres_tol = 1e-4
    s_loose._ewald_pair = None
    stk, _ = s_loose._ewald_objects()
    assert abs(stk.r_cut - 3.0 * stk.a) < 1e-12
    assert stk.grid.support == 7

    s_tight = _build("ewald")            # default tol 1e-10 from _build
    stk_t, _ = s_tight._ewald_objects()
    assert abs(stk_t.r_cut - 3.5 * stk_t.a) < 1e-12
    assert stk_t.grid.support == 11      # 2*ceil(6σ/h)+1 at points_per_a 3
    # explicit override wins
    s_over = _build("ewald")
    s_over.params.gmres_tol = 1e-4
    s_over.params.ewald_cut_in_a = 3.5
    s_over._ewald_pair = None
    stk_o, _ = s_over._ewald_objects()
    assert abs(stk_o.r_cut - 3.5 * stk_o.a) < 1e-12


def test_box_escape_triggers_rebuild_not_silence():
    """Geometry drifting outside the Ewald grid box would spread/interp with
    clamped or vanishing windows — silently wrong physics. The step must
    detect the escape, rebuild the evaluators on a fresh box, and still
    match the dense evaluator."""
    import jax.numpy as jnp

    def shift(system, d):
        system.fibers.blocks = [b.replace(x=b.x + jnp.asarray(d, b.x.dtype))
                                for b in system.fibers.blocks]

    s = _build("ewald")
    stk0, _ = s._ewald_objects()
    box0 = (stk0.box_lo.copy(), stk0.box_hi.copy())
    # translate everything far outside the auto box
    d = (box0[1] - box0[0]) * 2.0 + 1.0
    shift(s, d)
    r = s.step()
    assert bool(r[1])
    stk1, _ = s._ewald_objects()
    assert np.any(stk1.box_lo > box0[0]), "box was not rebuilt"

    s_direct = _build("direct")
    shift(s_direct, d)
    s_direct.step()
    x_d = np.concatenate([np.asarray(b.x).ravel()
                          for b in s_direct.fibers.blocks])
    x_e = np.concatenate([np.asarray(b.x).ravel() for b in s.fibers.blocks])
    assert np.abs(x_d - x_e).max() < 1e-6


def test_spectra_budget_grows_splitting_width(monkeypatch):
    """SKELLY_EWALD_SPECTRA_GB caps the stored-spectra footprint by growing
    the auto splitting width a (grid cells ~ 1/a³) — the O(N)-memory fix
    for the round-3 1M-point OOM. The solve must still converge and match
    the dense evaluator at the evaluator class (coarser grid + longer
    r_cut is a cost trade, not an accuracy one at fixed points_per_a)."""
    import os

    from skellysim_tpu.kernels.ewald import spectra_bytes

    s_free = _build("ewald")
    stk_free, _ = s_free._ewald_objects()

    # floor: taper padding keeps the padded grid >= ~48^3 even at huge a
    monkeypatch.setenv("SKELLY_EWALD_SPECTRA_GB", "0.02")
    s_cap = _build("ewald")
    stk_cap, _ = s_cap._ewald_objects()
    assert stk_cap.a > 1.1 * stk_free.a
    assert (spectra_bytes(stk_cap.box_lo, stk_cap.box_hi, stk_cap.a,
                          points_per_a=3.0, itemsize=8)
            <= 0.02 * 2**30 * 1.05)

    r = s_cap.step()
    assert bool(r[1])
    s_direct = _build("direct")
    s_direct.step()
    x_d = np.concatenate([np.asarray(b.x).ravel()
                          for b in s_direct.fibers.blocks])
    x_e = np.concatenate([np.asarray(b.x).ravel()
                          for b in s_cap.fibers.blocks])
    assert np.abs(x_d - x_e).max() < 1e-6


def test_measured_tier_pick_uses_crossover_record(tmp_path, monkeypatch):
    """The hybrid tier decision prefers the measured crossover model from
    docs/bench_records over the 2e9-pair heuristic (VERDICT r4 #3)."""
    import json
    import os

    import skellysim_tpu.system.system as ss

    rec_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(ss.__file__)))), "docs", "bench_records")
    os.makedirs(rec_dir, exist_ok=True)
    path = os.path.join(rec_dir, "bench_testtier_accel.json")
    rec = {"crossover_ms_per_apply": {
        "20000": {"dense_s": 4.4, "ewald_s": 15.5},
        "100000": {"dense_s": 102.8, "ewald_s": 44.2},
        "300000": {"dense_s": 921.9, "ewald_s": 151.5}}}
    with open(path, "w") as fh:
        json.dump(rec, fh)
    try:
        got = ss._measured_tier_pick()
        assert got is not None
        tier, how = got
        assert "measured crossover model" in how
        # r4 measured truth: dense wins at 20k, ewald wins at >=300k
        assert not tier(20000, 20000)
        assert tier(300000, 300000)
        assert tier(1000000, 1000000)          # O(N) extrapolation
        assert not tier(0, 100000)             # empty coupling stays dense
    finally:
        os.remove(path)
