"""Chebyshev toolbox + integrated-form spectral penalty fiber tests.

Coverage mirrors the reference's unit_test_skelly_chebyshev and
unit_test_fiber_chebyshev_penalty_autodiff scope: spectral exactness of the
toolbox operators, integrated-form reconstruction consistency, Newton
convergence with jacfwd Jacobians, and penalty-fiber physics (straight fiber
is a fixed point, bent fiber relaxes, inextensibility maintained)."""

import numpy as np
import pytest

import jax.numpy as jnp

from skellysim_tpu.fibers import chebyshev as ch
from skellysim_tpu.fibers.spectral_fiber import SpectralPenaltyFiber


def test_cheb_points_ascending_roots():
    x = ch.cheb_points(8)
    assert np.all(np.diff(x) > 0)
    # roots of T_8: T_8(x_i) = 0
    T8 = np.cos(8 * np.arccos(np.clip(x, -1, 1)))
    np.testing.assert_allclose(T8, 0.0, atol=1e-12)


def test_vandermonde_roundtrip():
    n = 16
    rng = np.random.default_rng(0)
    c = rng.normal(size=n)
    vals = ch.to_nodes(c)
    c_back = ch.to_coeffs(vals)
    np.testing.assert_allclose(c_back, c, atol=1e-10)


def test_derivative_matrix_exact_on_polynomials():
    n = 12
    D1 = ch.derivative_matrix(n, 1)
    D2 = ch.derivative_matrix(n, 2)
    x = ch.cheb_points(n)
    # f = T_3: f' = 3 U_2 -> check via values
    c = np.zeros(n)
    c[3] = 1.0
    d1 = D1 @ c
    vals = ch.cheb_basis(x, n - 1) @ d1
    want = 3 * (4 * x**2 - 1)  # T_3' = 3 U_2
    np.testing.assert_allclose(vals, want, atol=1e-10)
    d2 = D2 @ c
    vals2 = ch.cheb_basis(x, n - 2) @ d2
    np.testing.assert_allclose(vals2, 24 * x, atol=1e-10)


def test_integration_matrix_inverts_derivative():
    n = 10
    A_inv = ch.integration_matrix(n)
    rng = np.random.default_rng(1)
    f = rng.normal(size=n)
    d = ch.derivative_matrix(n, 1) @ f
    f_left = ch.cheb_basis(np.array([-1.0]), n) @ f
    rec = A_inv @ np.concatenate([d, f_left])
    np.testing.assert_allclose(rec, f, atol=1e-9)


def test_multiply_is_pointwise_product():
    rng = np.random.default_rng(2)
    a, b = rng.normal(size=6), rng.normal(size=6)
    n_out = 12
    c = np.asarray(ch.multiply(jnp.asarray(a), jnp.asarray(b), n_out))
    x = ch.cheb_points(24)
    va = ch.cheb_basis(x, 6) @ a
    vb = ch.cheb_basis(x, 6) @ b
    vc = ch.cheb_basis(x, n_out) @ c
    np.testing.assert_allclose(vc, va * vb, atol=1e-10)


def test_eval_endpoints():
    c = jnp.asarray([1.0, 2.0, 3.0, -1.0])
    # T_k(1) = 1, T_k(-1) = (-1)^k
    assert float(ch.eval_right(c)) == pytest.approx(5.0)
    assert float(ch.eval_left(c)) == pytest.approx(1 - 2 + 3 + 1)


def test_integrated_form_reconstruction_consistency():
    fib = SpectralPenaltyFiber(16, 16)
    L = 1.0
    XX = fib.initial_straight(L, direction=(1.0, 0.0))
    div = fib.divide_and_construct(XX, L)
    # straight along x: X(-1)=0, X(1)=L, Xs == 1 (d/ds), Y == 0
    assert float(ch.eval_left(div.XC)) == pytest.approx(0.0, abs=1e-12)
    assert float(ch.eval_right(div.XC)) == pytest.approx(L, abs=1e-10)
    vals = np.asarray(jnp.asarray(ch.vandermonde(fib.n_equations)) @ div.XsC)
    np.testing.assert_allclose(vals, 1.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(div.YC), 0.0, atol=1e-12)


def test_straight_fiber_is_steady_state():
    fib = SpectralPenaltyFiber(16, 16)
    L, E, dt = 1.0, 0.01, 1e-3
    XX0 = fib.initial_straight(L)
    XX1, res = fib.solve_timestep(XX0, L, E, dt)
    assert res < 1e-10
    p0 = np.asarray(fib.positions(XX0, L))
    p1 = np.asarray(fib.positions(XX1, L))
    np.testing.assert_allclose(p1, p0, atol=1e-8)
    assert float(fib.extensibility_error(XX1, L)) < 1e-8


def test_bent_fiber_relaxes_and_stays_inextensible():
    fib = SpectralPenaltyFiber(16, 16)
    L, E, dt = 1.0, 0.05, 2e-3
    XX = np.asarray(fib.initial_straight(L)).copy()
    # perturb the Y fourth-derivative coefficients a little
    n, ne = fib.n_nodes, fib.n_equations
    XX[n:n + 3] = [0.4, -0.2, 0.1]
    XX = jnp.asarray(XX)

    def bending_energy(XX):
        div = fib.divide_and_construct(XX, L)
        V = np.asarray(ch.vandermonde(fib.n_equations))
        xss = V @ np.asarray(div.XssC)
        yss = V @ np.asarray(div.YssC)
        return float(np.sum(xss**2 + yss**2))

    energies = [bending_energy(XX)]
    for _ in range(8):
        XX, res = fib.solve_timestep(XX, L, E, dt)
        assert res < 1e-9
        energies.append(bending_energy(XX))
        assert float(fib.extensibility_error(XX, L)) < 5e-3
    # curvature decays under relaxation; the first couple of steps may
    # reorganize the not-quite-arclength-consistent perturbation, so pin the
    # overall decay and the late-time monotone trend
    assert energies[-1] < 0.9 * energies[0]
    assert energies[-1] < energies[-2] < energies[-3]


# ---- cross-implementation golden data (Julia → reference C++ → here) ----
# The reference validates its spectral fiber against vectors produced by an
# independent Julia implementation
# (tests/core/unit_tests/julia_fiber_penalty_results.hpp:11-30,
#  unit_test_fiber_chebyshev_penalty_autodiff.cpp "real_forces" /
#  "real_evolution_xy"). tests/golden/julia_spectral_fiber.npz carries the
# same numbers; matching them pins this implementation to BOTH independent
# codes.

def _julia_golden():
    import os
    path = os.path.join(os.path.dirname(__file__), "golden",
                        "julia_spectral_fiber.npz")
    return np.load(path)


def test_julia_golden_divide_and_construct():
    g = _julia_golden()
    fib = SpectralPenaltyFiber(20, 18)
    div = fib.divide_and_construct(jnp.asarray(g["forces_XX"]), 1.0)
    np.testing.assert_allclose(np.asarray(div.XC), g["forces_Div_XC_true"],
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(div.YC), g["forces_Div_YC_true"],
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(div.TC), g["forces_Div_TC_true"],
                               rtol=0, atol=1e-10)


def test_julia_golden_forces():
    g = _julia_golden()
    fib = SpectralPenaltyFiber(20, 18)
    div = fib.divide_and_construct(jnp.asarray(g["forces_XX"]), 1.0)
    odiv = fib.divide_and_construct(jnp.asarray(g["forces_oldXX"]), 1.0)
    FxC, FyC, AFxC, AFyC = fib.forces(div, odiv, 1.0)
    np.testing.assert_allclose(np.asarray(FxC), g["forces_FxC_true"],
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(FyC), g["forces_FyC_true"],
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(AFxC), g["forces_AFxC_true"],
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(AFyC), g["forces_AFyC_true"],
                               rtol=0, atol=1e-9)


def test_julia_golden_evolution():
    g = _julia_golden()
    fib = SpectralPenaltyFiber(20, 18)
    zeta = 1000.0
    dt = 1.0 / zeta / 4.0
    XX = jnp.asarray(g["evol_XX"])
    div = fib.divide_and_construct(XX, 1.0)
    odiv = fib.divide_and_construct(XX, 1.0)
    _, _, AFxC, AFyC = fib.forces(div, odiv, 1.0)
    UC = zeta * div.YC
    VC = jnp.zeros_like(div.YC)
    eqXC, eqYC = fib.evolution(AFxC, AFyC, div, odiv, UC, VC, dt)
    # the reference's own gate is 1e-10 absolute
    # (unit_test_fiber_chebyshev_penalty_autodiff.cpp EXPECT_NEAR)
    np.testing.assert_allclose(np.asarray(eqXC), g["evol_eqXC_true"],
                               rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(eqYC), g["evol_eqYC_true"],
                               rtol=0, atol=1e-10)


# ---- the runnable driver (exceeds the reference: its spectral fiber is
# offline-only — System::init dispatches exclusively on FiniteDifference,
# reference system.cpp:109-110,657) ----

def test_spectral_system_cli_run(tmp_path, monkeypatch):
    """fiber_type="SpectralPenalty" through the CLI: a bent spectral fiber
    relaxes, stays inextensible, and writes a standard trajectory every
    reader consumes."""
    import subprocess
    import sys as _sys

    monkeypatch.chdir(tmp_path)
    cfg = """
[params]
fiber_type = "SpectralPenalty"
dt_initial = 2e-3
dt_write = 4e-3
t_final = 4e-2
gmres_tol = 1e-10

[[fibers]]
n_nodes = 16
length = 1.0
bending_rigidity = 0.05
curvature = [0.4, -0.2, 0.1]
"""
    (tmp_path / "skelly_config.toml").write_text(cfg)
    import os
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    r = subprocess.run([_sys.executable, "-m", "skellysim_tpu.cli",
                        "--config-file=skelly_config.toml", "--overwrite",
                        "--platform", "cpu"],
                       capture_output=True, text=True, env=env, cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-500:]

    from skellysim_tpu.io.trajectory import TrajectoryReader

    traj = TrajectoryReader("skelly_sim.out")
    assert len(traj) >= 4
    traj.load_frame(0)
    x0 = np.asarray(traj["fibers"][0]["x_"])
    traj.load_frame(-1)
    xf = np.asarray(traj["fibers"][0]["x_"])
    assert x0.shape == xf.shape == (32, 3)
    assert np.all(x0[:, 2] == 0.0)          # planar embedding

    # transverse deflection decays under bending relaxation (measured:
    # max|y| 1.0e-3 → 3.8e-4 over 20 steps at dt 2e-3, E 0.05)
    assert np.abs(xf[:, 1]).max() < 0.5 * np.abs(x0[:, 1]).max()

    # inextensibility: sampled arclength stays ~L
    def arclen(x):
        return float(np.sum(np.linalg.norm(np.diff(x, axis=0), axis=1)))

    assert abs(arclen(xf) - arclen(x0)) < 5e-3
