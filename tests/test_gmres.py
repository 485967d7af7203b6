"""GMRES solver tests: dense nonsymmetric systems vs numpy direct solve,
preconditioning, restarts, and jit-closure usage (the System matvec pattern)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skellysim_tpu.solver import gmres

RNG = np.random.default_rng(7)


def _well_conditioned(n):
    A = np.eye(n) * 4.0 + 0.5 * RNG.normal(size=(n, n))
    b = RNG.normal(size=n)
    return A, b


def test_gmres_matches_direct_solve():
    A, b = _well_conditioned(60)
    res = gmres(lambda v: jnp.array(A) @ v, jnp.array(b), tol=1e-12, restart=80)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b), rtol=1e-8, atol=1e-9)


def test_gmres_right_preconditioner_reduces_iterations():
    A, b = _well_conditioned(80)
    Minv = np.linalg.inv(A + 0.2 * RNG.normal(size=A.shape))
    plain = gmres(lambda v: jnp.array(A) @ v, jnp.array(b), tol=1e-10, restart=80)
    prec = gmres(
        lambda v: jnp.array(A) @ v,
        jnp.array(b),
        tol=1e-10,
        restart=80,
        precond=lambda v: jnp.array(Minv) @ v,
    )
    assert bool(prec.converged)
    assert int(prec.iterations) < int(plain.iterations)
    np.testing.assert_allclose(np.asarray(prec.x), np.linalg.solve(A, b), rtol=1e-7, atol=1e-8)


def test_gmres_restart_path():
    A, b = _well_conditioned(50)
    res = gmres(lambda v: jnp.array(A) @ v, jnp.array(b), tol=1e-10, restart=12, max_restarts=20)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b), rtol=1e-6, atol=1e-7)


def test_gmres_zero_rhs():
    A, _ = _well_conditioned(20)
    res = gmres(lambda v: jnp.array(A) @ v, jnp.zeros(20), tol=1e-10)
    np.testing.assert_allclose(np.asarray(res.x), 0.0)
    assert bool(res.converged)


def test_gmres_under_jit_with_closure_state():
    A, b = _well_conditioned(40)
    Aj = jnp.array(A)

    @jax.jit
    def solve(rhs):
        return gmres(lambda v: Aj @ v, rhs, tol=1e-11, restart=60).x

    np.testing.assert_allclose(np.asarray(solve(jnp.array(b))), np.linalg.solve(A, b),
                               rtol=1e-7, atol=1e-8)


@pytest.mark.parametrize("tol", [1e-6, 1e-10])
def test_gmres_reports_achieved_tolerance(tol):
    A, b = _well_conditioned(64)
    res = gmres(lambda v: jnp.array(A) @ v, jnp.array(b), tol=tol, restart=80)
    x = np.asarray(res.x)
    true_rel = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert true_rel <= 5 * tol
    assert float(res.residual) <= tol


def test_gmres_warm_start_matches_and_saves_iterations():
    A, b = _well_conditioned(60)
    x_exact = np.linalg.solve(A, b)
    cold = gmres(lambda v: jnp.array(A) @ v, jnp.array(b), tol=1e-12, restart=80)
    # near-solution start: converges in (far) fewer inner iterations to the
    # same answer — the System uses the previous step's solution this way
    x0 = jnp.array(x_exact + 1e-6 * RNG.normal(size=60))
    warm = gmres(lambda v: jnp.array(A) @ v, jnp.array(b), x0, tol=1e-12,
                 restart=80)
    assert bool(warm.converged)
    np.testing.assert_allclose(np.asarray(warm.x), x_exact, rtol=1e-8, atol=1e-9)
    assert int(warm.iterations) < int(cold.iterations)


def test_gmres_warm_start_already_converged_is_free():
    A, b = _well_conditioned(40)
    x_exact = np.linalg.solve(A, b)
    res = gmres(lambda v: jnp.array(A) @ v, jnp.array(b),
                jnp.array(x_exact), tol=1e-8, restart=80)
    assert bool(res.converged)
    assert int(res.iterations) == 0
    np.testing.assert_allclose(np.asarray(res.x), x_exact, rtol=1e-7, atol=1e-9)


def test_nonfinite_rhs_poisons_result():
    """A NaN RHS must return NaN x and converged=False — NOT a silent
    all-zeros 'solution' (the b_norm>0 guard sees NaN as False; the zeroed
    state then masquerades as physics downstream)."""
    import numpy as np

    A = jnp.eye(8) * 2.0
    b = jnp.ones(8).at[3].set(jnp.nan)
    res = gmres(lambda x: A @ x, b, tol=1e-8, restart=8)
    assert not bool(res.converged)
    assert not np.isfinite(float(res.residual))
    assert np.all(~np.isfinite(np.asarray(res.x)))


def test_nonfinite_operator_not_reported_converged():
    """A preconditioner/matvec that emits NaN mid-iteration must not
    masquerade as 'residual 0, converged' through the Givens where-fallback
    (the round-3 oocyte chip failure mode)."""
    import numpy as np

    A = jnp.eye(8) * 2.0
    b = jnp.ones(8)
    res = gmres(lambda x: A @ x, b, tol=1e-8, restart=8,
                precond=lambda x: x * jnp.nan)
    assert not bool(res.converged)
    assert not np.isfinite(float(res.residual))


def test_row_equilibrated_fiber_inverse_finite_and_accurate():
    """factorize() must survive the BC-applied operator's row-scale spread
    (O(1) constraint rows vs O(1e6+) interior rows): finite inverse,
    accurate apply."""
    import numpy as np

    from skellysim_tpu.fibers.fd_fiber import factorize

    rng = np.random.default_rng(3)
    n = 64
    # synthetic operator with the failure mode's structure: huge-scale
    # banded interior rows + O(1) dense constraint rows
    Ai = np.diag(rng.uniform(1e6, 3e6, n)) + 1e5 * np.diag(np.ones(n - 1), 1)
    Ai[-7:] = rng.normal(size=(7, n))          # constraint rows, O(1)
    A = jnp.asarray(Ai[None], jnp.float32)
    inv, _ = factorize(A)
    assert np.all(np.isfinite(np.asarray(inv)))
    x = rng.normal(size=n).astype(np.float32)
    y = np.asarray(inv[0]) @ (Ai @ x).astype(np.float32)
    assert np.abs(y - x).max() < 1e-3 * np.abs(x).max()


def test_segmented_step_matches_single_program():
    """Host-driven GMRES restart segmentation (one restart cycle per
    program + x0 carry, the tunneled-TPU watchdog workaround) must
    reproduce the one-shot step to solver tolerance."""
    import numpy as np

    from skellysim_tpu.config import Config, Fiber, perturbed_fiber_positions
    from skellysim_tpu.system import System

    def make_cfg():
        # tightly clustered CURVED fibers: bending forces drive the
        # hydrodynamic coupling (straight fibers have zero bending force
        # and solve in one iteration), cold start keeps the count high
        config = Config()
        config.params.eta = 1.0
        config.params.dt_initial = 1e-2
        config.params.dt_max = 1e-2
        config.params.gmres_tol = 1e-10
        config.params.pair_evaluator = "direct"
        config.params.precision = "double"
        config.params.gmres_warm_start = False
        rng = np.random.default_rng(7)
        fibers = []
        for i in range(12):
            x = perturbed_fiber_positions(
                0.08, 1.0, rng.uniform(-0.2, 0.2, size=3),
                np.array([0.0, 0.0, 1.0]), 8, rng=rng)
            fibers.append(Fiber(n_nodes=8, length=1.0,
                                bending_rigidity=0.01, radius=0.0125,
                                x=x.ravel().tolist()))
        config.fibers = fibers
        return config.to_dict()

    s_ref = System(make_cfg())
    s_ref.step()
    ref = np.asarray(s_ref.curr_solution)
    assert s_ref._last_iters > 8           # genuinely coupled solve

    cfg2 = make_cfg()
    cfg2["params"]["gmres_segmented"] = True
    cfg2["params"]["gmres_restart"] = 6   # force several segments
    s_seg = System(cfg2)
    assert s_seg._segmented
    err, conv = s_seg.step()
    assert conv
    assert s_seg._last_iters > 6          # really crossed a segment boundary
    got = np.asarray(s_seg.curr_solution)
    scale = np.abs(ref).max()
    # both runs meet the same ||b - A x|| <= tol ||b|| criterion; distinct
    # Krylov paths differ in the SOLUTION by ~condition x residual class
    np.testing.assert_allclose(got, ref, rtol=0, atol=3e-6 * scale)
