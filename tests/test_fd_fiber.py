"""Unit tests for the batched FD fiber block.

Strategy mirrors the reference's fiber unit tests plus its analytic e2e check
pulled down to the single-fiber level: an isolated straight fiber under
tangential force must translate at the slender-body drag velocity
v = 2 c0 f (γ = −4πLη/ln(e ε²)), clamped ends must not move, and the
matvec/preconditioner/force-operator must be mutually consistent."""

import numpy as np
import pytest

import jax.numpy as jnp

from skellysim_tpu.fibers import fd_fiber as ff
from skellysim_tpu.fibers.fd_fiber import (
    BC_MINUS_CLAMPED,
    BC_MINUS_FREE,
    BC_PLUS_FREE,
    FiberOperators,
    make_fiber_block,
)


def straight_block(n=16, B=1, length=0.75, E=0.0025, radius=0.0125, force_scale=0.31):
    x = np.zeros((B, n, 3))
    for b in range(B):
        x[b, :, 2] = np.linspace(0, length, n)
    return make_fiber_block(x, length, E, radius=radius, force_scale=force_scale)


def solve_isolated(block, eta=0.7, dt=1e-4, bc_minus=None, f_external=None):
    """One implicit step of an isolated fiber (no hydrodynamic coupling)."""
    ops = FiberOperators.for_node_count(block.n_nodes)
    B = block.n_fibers
    if bc_minus is None:
        bc_minus = jnp.full((B,), BC_MINUS_FREE)
    bc_plus = jnp.full((B,), BC_PLUS_FREE)
    if f_external is None:
        c0, c1 = ff.sbt_constants(block, eta)
        xs, *_ = ff.derivatives(block, ops)
        f_external = block.force_scale[:, None, None] * xs
    cache = ff.update_cache(
        block, ops, eta, jnp.asarray(dt), bc_minus, bc_plus,
        flow=None, f_external=f_external,
        v_on_fiber=None, f_on_fiber=jnp.zeros_like(block.x),
    )
    sol = ff.precondition(cache, cache.RHS.reshape(-1))
    return ops, cache, sol.reshape(B, 4 * block.n_nodes)


@pytest.mark.parametrize("n", [8, 16, 32])
def test_straight_fiber_translates_at_sbt_drag_velocity(n):
    eta, dt = 0.7, 1e-4
    block = straight_block(n=n)
    ops, cache, sol = solve_isolated(block, eta=eta, dt=dt)
    x_new = sol[0, :3 * n].reshape(3, n).T
    v = (np.asarray(x_new) - np.asarray(block.x[0])) / dt

    eps = float(block.radius[0] / block.length[0])
    gamma_theory = -4 * np.pi * float(block.length[0]) * eta / np.log(np.e * eps**2)
    fs = float(block.force_scale[0])
    v_theory = fs * float(block.length[0]) / gamma_theory

    np.testing.assert_allclose(v[:, 2], v_theory, rtol=1e-6)
    np.testing.assert_allclose(v[:, :2], 0.0, atol=1e-10)


def test_clamped_minus_end_stays_fixed():
    n, dt = 16, 1e-4
    block = straight_block(n=n).replace(minus_clamped=jnp.array([True]))
    bc_minus = jnp.full((1,), BC_MINUS_CLAMPED)
    ops, cache, sol = solve_isolated(block, dt=dt, bc_minus=bc_minus)
    x_new = np.asarray(sol[0, :3 * n].reshape(3, n).T)
    # minus end pinned, plus end moves under the tangential force
    np.testing.assert_allclose(x_new[0], np.asarray(block.x[0, 0]), atol=1e-9)
    assert abs(x_new[-1, 2] - float(block.x[0, -1, 2])) > 1e-9


def test_batched_assembly_matches_single():
    # a batch of 3 different fibers must produce exactly the same operators as
    # three single-fiber batches
    n = 16
    rng = np.random.default_rng(3)
    xs = []
    for i in range(3):
        t = np.linspace(0, 1, n)
        x = np.stack([0.05 * rng.normal() * np.sin(3 * t), 0.05 * rng.normal() * t**2, t], axis=1)
        xs.append(x)
    lengths = [1.0, 1.1, 0.9]
    Es = [0.0025, 0.004, 0.001]
    batch = make_fiber_block(np.stack(xs), jnp.array(lengths), jnp.array(Es))
    ops = FiberOperators.for_node_count(n)
    bm = jnp.array([0, 1, 0])
    bp = jnp.array([0, 0, 0])
    cache_b = ff.update_cache(batch, ops, 1.0, jnp.asarray(1e-3), bm, bp)
    for i in range(3):
        single = make_fiber_block(xs[i][None], lengths[i], Es[i])
        cache_s = ff.update_cache(single, ops, 1.0, jnp.asarray(1e-3), bm[i:i+1], bp[i:i+1])
        np.testing.assert_allclose(np.asarray(cache_b.A[i]), np.asarray(cache_s.A[0]), atol=1e-12)
        np.testing.assert_allclose(np.asarray(cache_b.RHS[i]), np.asarray(cache_s.RHS[0]), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(cache_b.force_operator[i]), np.asarray(cache_s.force_operator[0]), atol=1e-12
        )


def test_matvec_equals_operator_apply_when_no_flow():
    n = 16
    block = straight_block(n=n)
    ops, cache, _ = solve_isolated(block)
    rng = np.random.default_rng(0)
    x = jnp.array(rng.normal(size=4 * n))
    y = ff.matvec(block, ops, cache, x, jnp.zeros((1, n, 3)))
    want = np.asarray(cache.A[0]) @ np.asarray(x)
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-12)


def test_preconditioner_inverts_operator():
    n = 24
    block = straight_block(n=n)
    ops, cache, _ = solve_isolated(block)
    rng = np.random.default_rng(1)
    x = jnp.array(rng.normal(size=4 * n))
    y = ff.matvec(block, ops, cache, x, jnp.zeros((1, n, 3)))
    x_back = ff.precondition(cache, y)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), rtol=1e-8, atol=1e-8)


def test_force_operator_physics():
    # f = -E X'''' + T X'' + T' X' evaluated via the dense operator must match
    # direct derivative computation for a smooth curved fiber
    n = 32
    t = np.linspace(0, 1, n)
    x = np.stack([0.1 * np.sin(2 * t), np.zeros(n), t], axis=1)
    block = make_fiber_block(x[None], 1.0, 0.003)
    ops = FiberOperators.for_node_count(n)
    c0, c1 = ff.sbt_constants(block, 1.0)
    xs, xss, xsss, xssss = ff.derivatives(block, ops)
    F = ff.assemble_force_operator(block, ops, xs, xss)

    rng = np.random.default_rng(2)
    T = rng.normal(size=n)
    sol = np.concatenate([x[:, 0], x[:, 1], x[:, 2], T])
    f = np.asarray(jnp.einsum("brc,bc->br", F, jnp.array(sol)[None]))[0].reshape(3, n).T

    s = 2.0 / 1.0
    D1 = s * np.asarray(ops.D1)
    E = 0.003
    Tp = D1 @ T
    want = -E * np.asarray(xssss[0]) + T[:, None] * np.asarray(xss[0]) + Tp[:, None] * np.asarray(xs[0])
    np.testing.assert_allclose(f, want, atol=1e-10)


def test_fiber_error_zero_for_arclength_parametrized():
    block = straight_block(n=32, length=1.0)
    ops = FiberOperators.for_node_count(32)
    err = float(ff.fiber_error(block, ops))
    assert err < 1e-10


def test_weighted_forces_integrate_constant():
    block = straight_block(n=16, length=0.75)
    ops = FiberOperators.for_node_count(16)
    f = jnp.ones((1, 16, 3))
    wf = ff.weighted_forces(block, ops, f)
    # total force = integral of density over fiber = L * f
    np.testing.assert_allclose(np.asarray(wf.sum(axis=1))[0], 0.75, atol=1e-12)


def test_step_unpacks_solution_layout():
    n = 8
    block = straight_block(n=n)
    sol = jnp.arange(4 * n, dtype=jnp.float64)
    new = ff.step(block, sol)
    np.testing.assert_allclose(np.asarray(new.x[0, :, 0]), np.arange(n))
    np.testing.assert_allclose(np.asarray(new.x[0, :, 1]), np.arange(n, 2 * n))
    np.testing.assert_allclose(np.asarray(new.tension[0]), np.arange(3 * n, 4 * n))


def test_factorize_chunked_matches_flat(monkeypatch):
    """The lax.map-chunked batched inverse (>=1e6-regime temp bound) must
    match the flat vmap path, including the non-divisible-batch pad."""
    import skellysim_tpu.fibers.fd_fiber as fd

    rng = np.random.default_rng(5)
    m, B = 12, 37                      # 37 % chunk != 0 exercises the pad
    A = jnp.asarray(rng.normal(size=(B, m, m)) + 6 * np.eye(m), jnp.float64)
    flat, _ = fd.factorize(A)
    monkeypatch.setattr(fd, "_FACTORIZE_CHUNK_INPUT_BYTES", 1)
    monkeypatch.setattr(fd, "_FACTORIZE_CHUNK_TARGET_BYTES",
                        8 * m * m * A.dtype.itemsize)
    chunked, _ = fd.factorize(A)
    assert chunked.shape == flat.shape
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(flat),
                               rtol=0, atol=1e-13 * np.abs(flat).max())


def test_update_cache_chunked_matches_flat(monkeypatch):
    """The lax.map-chunked cache build (assembly was the r4b 1M OOM: seven
    ~1.9 GB BC-pipeline temps) must match the flat path bit-for-bit in f64,
    including the non-divisible-batch pad and inactive slots."""
    import skellysim_tpu.fibers.fd_fiber as fd

    rng = np.random.default_rng(11)
    n, B = 16, 13                      # 13 % chunk != 0 exercises the pad
    x = np.zeros((B, n, 3))
    for b in range(B):
        x[b, :, 2] = np.linspace(0, 0.6 + 0.02 * b, n)
        x[b, :, 0] = 0.01 * rng.normal(size=n)
    block = make_fiber_block(x, 0.7, 0.0025, force_scale=0.3)
    block = block.replace(active=jnp.asarray([True] * (B - 2) + [False] * 2))
    ops = FiberOperators.for_node_count(n)
    bc_minus = jnp.asarray([BC_MINUS_CLAMPED, BC_MINUS_FREE] * 6 + [BC_MINUS_FREE])
    bc_plus = jnp.full((B,), BC_PLUS_FREE)
    flow = jnp.asarray(rng.normal(size=(B, n, 3)) * 1e-3)
    f_ext = jnp.asarray(rng.normal(size=(B, n, 3)) * 1e-2)
    args = (block, ops, 0.7, jnp.asarray(1e-4), bc_minus, bc_plus)
    kw = dict(flow=flow, f_external=f_ext,
              v_on_fiber=jnp.asarray(rng.normal(size=(B, n, 3)) * 1e-3),
              f_on_fiber=jnp.asarray(rng.normal(size=(B, n, 3)) * 1e-3))
    flat = fd._update_cache_impl(*args, **kw)
    # force the chunked path with a chunk that doesn't divide B
    monkeypatch.setattr(fd, "_FACTORIZE_CHUNK_INPUT_BYTES", 1)
    monkeypatch.setattr(fd, "_FACTORIZE_CHUNK_TARGET_BYTES",
                        4 * (4 * n) ** 2 * 8)
    chunked = fd.update_cache(*args, **kw)
    for name in ("A", "A_lu", "RHS", "force_operator", "xs", "xssss"):
        a, b = np.asarray(getattr(flat, name)), np.asarray(getattr(chunked, name))
        assert a.shape == b.shape, name
        np.testing.assert_allclose(b, a, rtol=0,
                                   atol=1e-12 * max(np.abs(a).max(), 1.0),
                                   err_msg=name)
