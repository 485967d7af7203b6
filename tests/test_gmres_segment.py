"""gmres_segment: Arnoldi continuation across host-driven segments.

The continuation must reproduce plain GMRES(m) exactly no matter how the
cycle is chopped into per-program segments (the tunneled-TPU watchdog
workaround, round 5). Reference analogue: Belos runs its iteration loop
host-side anyway (solver_hydro.cpp:63-95); this is the jit-compatible
equivalent with the Krylov state as an explicit carry.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skellysim_tpu.solver import GmresCarry, gmres, gmres_segment


def _system(n=96, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    # well-separated spectrum: perturbation spectral radius ~0.5 gives the
    # ~0.5^k GMRES rate, so 1e-12 needs ~40 < m iterations
    A = np.eye(n) + 0.5 * rng.normal(size=(n, n)) / np.sqrt(n)
    b = rng.normal(size=n)
    Aj = jnp.asarray(A, dtype)
    return (lambda v: Aj @ v), jnp.asarray(b, dtype), np.asarray(A), b


def _drive(matvec, b, *, tol, m, k, max_segs=64):
    """Host loop: extend one GMRES(m) cycle k iterations per call,
    restarting from the LS estimate when the basis fills."""
    x0 = jnp.zeros_like(b)
    carry = None
    total = 0
    residuals = []
    for _ in range(max_segs):
        seg = gmres_segment(matvec, b, x0, carry, tol=tol, restart=m,
                            seg_iters=k)
        residuals.append(float(seg.residual))
        if bool(seg.converged):
            return seg.x, total + int(seg.iterations), residuals, True
        if int(seg.iterations) >= m:
            total += int(seg.iterations)
            x0 = seg.x
            carry = None
        else:
            carry = seg.carry
    return seg.x, total + int(seg.iterations), residuals, False


def test_segment_matches_oneshot_within_single_cycle():
    """Chopping one cycle into segments changes nothing: same iteration
    count and (to roundoff) the same solution as gmres() when the solve
    fits in one cycle."""
    matvec, b, A, bh = _system()
    ref = gmres(matvec, b, tol=1e-12, restart=60, max_restarts=1)
    assert bool(ref.converged)
    for k in (3, 7, 64):
        x, iters, _, conv = _drive(matvec, b, tol=1e-12, m=60, k=k)
        assert conv
        assert iters == int(ref.iterations), (k, iters, int(ref.iterations))
        np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x),
                                   rtol=0, atol=1e-10)


def test_segment_residual_monotone_within_cycle():
    """The LS residual is non-increasing across continuation segments of
    one cycle — the property the host stall guard relies on (a restarted
    GMRES(k) would NOT have it)."""
    matvec, b, *_ = _system(seed=3)
    _, _, residuals, conv = _drive(matvec, b, tol=1e-12, m=60, k=4)
    assert conv
    assert all(r2 <= r1 * (1 + 1e-12) for r1, r2
               in zip(residuals, residuals[1:]))


def test_midcycle_solution_is_valid_ls_estimate():
    """The x returned at a segment boundary is the true least-squares
    solution of the partial Krylov system: its residual matches the
    cheaply-updated |g[j+1]| estimate."""
    matvec, b, A, bh = _system(seed=5)
    seg = gmres_segment(matvec, b, jnp.zeros_like(b), None, tol=1e-14,
                        restart=60, seg_iters=9)
    assert int(seg.iterations) == 9
    true_res = np.linalg.norm(bh - A @ np.asarray(seg.x)) / np.linalg.norm(bh)
    assert abs(true_res - float(seg.residual)) < 1e-10


def test_cycle_restart_converges_hard_case():
    """A basis smaller than the iteration need forces host-side cycle
    restarts; the drive must still converge (restarted GMRES(m))."""
    matvec, b, *_ = _system(n=128, seed=7)
    x, iters, _, conv = _drive(matvec, b, tol=1e-10, m=24, k=8)
    assert conv
    r = np.asarray(matvec(x) - b)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-9


def test_sentinel_carry_matches_none_and_restart_reuses_buffers():
    """A j=-1 sentinel carry must behave exactly like carry=None (the
    single-executable path), including when the sentinel's V holds STALE
    rows from a previous cycle (the host reuses the buffers on restart)."""
    matvec, b, *_ = _system(seed=13)
    x0 = jnp.zeros_like(b)
    ref = gmres_segment(matvec, b, x0, None, tol=1e-12, restart=20,
                        seg_iters=8)
    n = b.shape[0]
    stale = GmresCarry(
        V=jnp.full((21, n), 7.7, b.dtype), H=jnp.full((21, 20), 3.3, b.dtype),
        cs=jnp.ones(20, b.dtype), sn=jnp.ones(20, b.dtype),
        g=jnp.ones(21, b.dtype), j=jnp.asarray(-1, jnp.int32),
        res=jnp.asarray(jnp.inf, b.dtype))
    seg = gmres_segment(matvec, b, x0, stale, tol=1e-12, restart=20,
                        seg_iters=8)
    assert int(seg.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(seg.x), np.asarray(ref.x),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(float(seg.residual), float(ref.residual),
                               rtol=1e-12, atol=0)


def test_nonfinite_rhs_poisons_segment():
    matvec, b, *_ = _system()
    b = b.at[0].set(jnp.nan)
    seg = gmres_segment(matvec, b, jnp.zeros_like(b), None, tol=1e-10,
                        restart=20, seg_iters=8)
    assert not bool(seg.converged)
    assert np.isnan(float(seg.residual))


def test_warm_start_cycle_base():
    """x0 is the cycle base: starting at the exact solution converges in
    zero iterations of the continuation."""
    matvec, b, A, bh = _system(seed=11)
    x_exact = jnp.asarray(np.linalg.solve(A, bh))
    seg = gmres_segment(matvec, b, x_exact, None, tol=1e-8,
                        restart=20, seg_iters=8)
    assert bool(seg.converged)
    assert int(seg.iterations) == 0
