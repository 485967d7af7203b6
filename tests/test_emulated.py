"""Emulated (double-word) precision: the increment-form fiber solve.

The reference reaches gmres_tol 1e-10 with f64 (src/core/params.cpp:14);
the TPU has no f64 vector hardware, so precision="emulated" runs f32 with
(hi, lo) state and an accurately-computed residual (fd_fiber.residual_delta,
utils/compensated.py). These tests pin:
  * the factored residual algebra against the assembled operator (f64,
    where direct evaluation of RHS − A·s is itself accurate),
  * the double-word state advance,
  * the e2e drag gate (tests/combined/test_fiber_const_force.py:58-77
    analogue) in f32 emulated mode at accuracy plain f32 cannot reach.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skellysim_tpu.fibers import fd_fiber as ff
from skellysim_tpu.utils import compensated as comp


def _bent_block(B=3, n=16, dtype=jnp.float64, beta=1.0, grow=True, L=0.9):
    """Arclength-parameterized circular arcs (|x_s| ≡ 1): the physical
    near-inextensible regime where the tension equation's p(1 − |x_s|²)
    cancellation — the term the dd path protects — is actually active."""
    rng = np.random.default_rng(7)
    s = np.linspace(0.0, L, n)
    xs = []
    for b in range(B):
        R = 1.5 + 0.7 * b
        x = np.stack([R * (1.0 - np.cos(s / R)), 0.02 * b * s,
                      R * np.sin(s / R)], axis=-1)
        x[:, 1] *= 1.0 / np.sqrt(1.0 + (0.02 * b) ** 2)
        x[:, [0, 2]] *= 1.0 / np.sqrt(1.0 + (0.02 * b) ** 2)
        xs.append(x)
    blk = ff.make_fiber_block(
        np.stack(xs), lengths=L, bending_rigidity=2.5e-3, radius=0.0125,
        force_scale=-0.02, dtype=dtype, emulated=True)
    del rng
    s_n = np.linspace(0.0, 1.0, n)
    tension = 0.1 * np.cos(np.pi * s_n)[None, :] * (1.0 + 0.3 * np.arange(B))[:, None]
    blk = blk.replace(
        tension=jnp.asarray(tension, dtype),
        beta_tstep=jnp.full((B,), beta, dtype),
        length_prev=(blk.length * (1.0 + 1.0 / 8192.0) if grow
                     else blk.length),
        v_growth=jnp.full((B,), 0.01 if grow else 0.0, dtype))
    return blk


@pytest.mark.parametrize("beta", [1.0, 0.5])
@pytest.mark.parametrize("bc", [(ff.BC_MINUS_CLAMPED, ff.BC_PLUS_FREE),
                                (ff.BC_MINUS_FREE, ff.BC_PLUS_HINGED)])
def test_residual_delta_matches_assembled(beta, bc):
    """residual_delta (factored, double-word) ≡ RHS_bc − A_bc·s_prev of the
    assembled operator, verified in f64 where the direct form is accurate."""
    dtype = jnp.float64
    blk = _bent_block(dtype=dtype, beta=beta)
    B, n = blk.n_fibers, blk.n_nodes
    ops = ff.FiberOperators.for_node_count(n, dtype)
    ops_lo = ff.FiberOperatorsLo.for_node_count(n, dtype)
    rng = np.random.default_rng(3)
    eta, dt = 0.9, 1e-2
    flow = jnp.asarray(rng.normal(scale=0.01, size=(B, n, 3)), dtype)
    f_ext = jnp.asarray(rng.normal(scale=0.05, size=(B, n, 3)), dtype)
    bc_minus = jnp.full((B,), bc[0], jnp.int32)
    bc_plus = jnp.full((B,), bc[1], jnp.int32)

    cache = ff.update_cache(blk, ops, eta, dt, bc_minus, bc_plus,
                            flow=flow, f_external=f_ext,
                            v_on_fiber=flow, f_on_fiber=f_ext)
    s_prev = ff.pack_solution(blk).reshape(B, 4 * n)
    direct = cache.RHS - jnp.einsum("brc,bc->br", cache.A, s_prev)

    R = ff.residual_delta(blk, ops, ops_lo, eta, dt, bc_minus, bc_plus,
                          flow=flow, f_external=f_ext,
                          v_on_fiber=flow, f_on_fiber=f_ext)
    # the direct form's own cancellation noise is ~eps·|x|/dt ≈ 1e-14;
    # compare against the row scale of the direct residual
    scale = float(jnp.abs(direct).max()) + 1.0 / dt * 1e-12
    err = float(jnp.abs(R - direct).max())
    assert err < 1e-10 * (1.0 + scale), (err, scale)


def test_residual_delta_f32_beats_direct_f32():
    """In f32, the factored dd residual matches the f64 truth ~3 orders
    better than the directly-evaluated f32 RHS − A·s (the whole point).

    L = 0.5 and no growth keep the 2/L operator scalings exactly
    representable in BOTH dtypes: otherwise the comparison measures the
    (physically harmless, step-constant) f32 rounding of 2/L — amplified by
    the penalty p — instead of the residual algorithm."""
    blk64 = _bent_block(dtype=jnp.float64, grow=False, L=0.5)
    n = blk64.n_nodes
    B = blk64.n_fibers
    ops64 = ff.FiberOperators.for_node_count(n, jnp.float64)
    ops_lo64 = ff.FiberOperatorsLo.for_node_count(n, jnp.float64)
    eta, dt = 0.9, 1e-4
    bc_minus = jnp.zeros((B,), jnp.int32)
    bc_plus = jnp.zeros((B,), jnp.int32)
    R64 = ff.residual_delta(blk64, ops64, ops_lo64, eta, dt, bc_minus,
                            bc_plus)

    # f32 block carrying the same f64 state in (hi, lo)
    x64 = np.asarray(blk64.x, np.float64)
    t64 = np.asarray(blk64.tension, np.float64)
    blk32 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a,
        blk64)
    blk32 = blk32.replace(
        x_lo=jnp.asarray(x64 - x64.astype(np.float32), jnp.float32),
        tension_lo=jnp.asarray(t64 - t64.astype(np.float32), jnp.float32))
    ops32 = ff.FiberOperators.for_node_count(n, jnp.float32)
    ops_lo32 = ff.FiberOperatorsLo.for_node_count(n, jnp.float32)
    R32 = ff.residual_delta(blk32, ops32, ops_lo32, eta, dt, bc_minus,
                            bc_plus)

    cache32 = ff.update_cache(blk32, ops32, eta, dt, bc_minus, bc_plus)
    direct32 = cache32.RHS - jnp.einsum(
        "brc,bc->br", cache32.A, ff.pack_solution(blk32).reshape(B, 4 * n))

    scale = float(jnp.abs(R64).max())
    err_dd = float(jnp.abs(R32.astype(jnp.float64) - R64).max())
    err_direct = float(jnp.abs(direct32.astype(jnp.float64) - R64).max())
    assert err_dd < 1e-5 * scale, (err_dd, scale)
    assert err_dd < 1e-3 * err_direct, (err_dd, err_direct)


def test_step_delta_accumulates_subulp():
    """1000 double-word accumulations of a sub-ulp increment recover the
    f64 sum; plain f32 accumulation loses it entirely."""
    blk = _bent_block(dtype=jnp.float32)
    B, n = blk.n_fibers, blk.n_nodes
    inc = 1e-9  # ≪ ulp(|x| ≈ 1) in f32
    delta = jnp.zeros((B, 4, n), jnp.float32).at[:, 2, :].set(inc).reshape(B, -1)
    x0 = np.asarray(blk.x, np.float64) + np.asarray(blk.x_lo, np.float64)
    for _ in range(1000):
        blk = ff.step_delta(blk, delta.reshape(-1))
    xf = np.asarray(blk.x, np.float64) + np.asarray(blk.x_lo, np.float64)
    drift = xf[:, :, 2] - x0[:, :, 2]
    assert np.allclose(drift, 1000 * inc, rtol=1e-6), drift.ravel()[:4]


@pytest.mark.slow
def test_emulated_drag_gate(tmp_path, monkeypatch):
    """fiber_const_force analytic drag in f32 EMULATED mode: rel < 1e-5 —
    an accuracy class plain f32 cannot reach (measured ~7e-4)."""
    monkeypatch.chdir(tmp_path)
    from skellysim_tpu.config import Config, Fiber
    from skellysim_tpu.io import tomlio
    from skellysim_tpu.io.trajectory import TrajectoryReader
    from skellysim_tpu.system import System

    config = Config()
    config.params.eta = 0.7
    config.params.dt_initial = 1e-4
    config.params.dt_min = 1e-4
    config.params.dt_max = 1e-4
    config.params.dt_write = 1e-3
    config.params.t_final = 5e-3
    config.params.gmres_tol = 1e-7
    config.params.seed = 130319
    config.params.pair_evaluator = "direct"
    config.params.precision = "emulated"
    fib = Fiber(force_scale=0.31, length=0.75, n_nodes=8,
                bending_rigidity=0.0025)
    fib.fill_node_positions(np.array([0.0, 0.0, 0.0]),
                            np.array([0.0, 0.0, 1.0]))
    config.fibers = [fib]
    config.save("skelly_config.toml")
    s = System(tomlio.load("skelly_config.toml"))
    s.run()
    traj = TrajectoryReader("skelly_sim.out")
    traj.load_frame(0)
    x0 = np.asarray(traj["fibers"][0]["x_"]); t0 = traj["time"]
    traj.load_frame(-1)
    xf = np.asarray(traj["fibers"][0]["x_"]); tf = traj["time"]
    v_z = float(np.mean(((xf - x0) / (tf - t0))[:, 2]))
    eps = fib.radius / fib.length
    gamma = fib.force_scale * fib.length / v_z
    gamma_theory = (-4 * np.pi * fib.length * config.params.eta
                    / np.log(np.e * eps**2))
    assert abs(1 - gamma / gamma_theory) < 1e-5
