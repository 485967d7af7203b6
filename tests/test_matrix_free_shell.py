"""Matrix-free periphery operator (the 788k-DOF HBM-wall mitigation).

In matrix-free mode the shell's second-kind operator is never stored: its
action is one dense pairwise stresslet apply + O(N) corrections
(shell.second_kind_apply_free), and the Newton–Schulz preconditioner is
kept in bf16 (preconditioner-only: entry rounding shifts convergence, not
the solution). These tests pin the apply against the stored operator and a
full solve against the dense-mode solve."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skellysim_tpu.periphery import shell as shell_ops


def _geom(n=300, dtype=jnp.float64):
    from skellysim_tpu.precompute import quadrature, shapes
    from skellysim_tpu.precompute.main import PERIPHERY_NODE_SCALE_FACTOR as SF

    surf = shapes.sphere(n, 4.0 * SF)
    weights = quadrature.sphere_weights(surf.nodes, 4.0 * SF)
    return (jnp.asarray(surf.nodes, dtype), jnp.asarray(-surf.normals, dtype),
            jnp.asarray(weights, dtype))


def test_matrix_free_apply_matches_stored():
    nodes, normals, weights = _geom()
    A, M_inv, e_sub = jax.jit(shell_ops.build_shell_operators_with_esub)(
        nodes, normals, weights)
    A2, _ = jax.jit(shell_ops.build_shell_operators)(nodes, normals, weights)
    np.testing.assert_allclose(np.asarray(A), np.asarray(A2), rtol=0,
                               atol=1e-12)

    state_dense = shell_ops.ShellState(
        nodes=nodes, normals=normals, weights=weights, M_inv=M_inv, A=A,
        solution=jnp.zeros(3 * nodes.shape[0]), blocked=True)
    state_free = state_dense.replace(A=None, e_sub=e_sub)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=3 * nodes.shape[0]))
    v = jnp.zeros((nodes.shape[0], 3))
    y_dense = np.asarray(shell_ops.matvec(state_dense, x, v))
    y_free = np.asarray(shell_ops.matvec(state_free, x, v))
    scale = np.abs(y_dense).max()
    np.testing.assert_allclose(y_free, y_dense, rtol=0, atol=1e-10 * scale)


def test_bf16_precondition_close():
    nodes, normals, weights = _geom(200, jnp.float32)
    A, M_inv, e_sub = jax.jit(shell_ops.build_shell_operators_with_esub)(
        nodes, normals, weights)
    state = shell_ops.ShellState(
        nodes=nodes, normals=normals, weights=weights,
        M_inv=M_inv.astype(jnp.bfloat16), A=None,
        solution=jnp.zeros(3 * nodes.shape[0], jnp.float32), blocked=True,
        e_sub=e_sub)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=3 * nodes.shape[0]), jnp.float32)
    y = np.asarray(shell_ops.precondition(state, x))
    want = np.asarray(shell_ops._apply(state.replace(M_inv=M_inv), M_inv, x))
    # bf16 entries: ~0.4% — plenty for a preconditioner
    assert np.linalg.norm(y - want) / np.linalg.norm(want) < 0.02


def test_matrix_free_e2e_matches_dense(tmp_path, monkeypatch):
    """Full coupled solve: a fiber inside a device-built spherical shell,
    matrix-free vs dense-operator mode, same trajectory."""
    monkeypatch.chdir(tmp_path)
    from skellysim_tpu.config import Config, Fiber, Periphery
    from skellysim_tpu.io import tomlio
    from skellysim_tpu.system import System

    def run(matrix_free):
        config = Config()
        config.params.eta = 1.0
        config.params.dt_initial = 1e-3
        config.params.dt_min = 1e-4
        config.params.dt_max = 1e-3
        config.params.dt_write = 1e-3
        config.params.t_final = 3e-3
        config.params.gmres_tol = 1e-10
        config.params.pair_evaluator = "direct"
        config.periphery = Periphery(n_nodes=300, shape="sphere", radius=4.0,
                                     precompute_file="unused.npz")
        fib = Fiber(force_scale=0.2, length=0.75, n_nodes=8,
                    bending_rigidity=0.0025)
        fib.fill_node_positions(np.array([1.0, 0.0, 0.0]),
                                np.array([0.0, 0.0, 1.0]))
        config.fibers = [fib]
        config.save("skelly_config.toml")
        cfg = tomlio.load("skelly_config.toml")
        cfg["periphery"]["build_on_device"] = True
        cfg["periphery"]["matrix_free"] = matrix_free
        s = System(cfg)
        s.run()
        return np.asarray(s.fibers.blocks[0].x[0])

    x_dense = run(False)
    x_free = run(True)
    # identical operator (to f64 roundoff), bf16 precond only affects the
    # GMRES path — trajectories agree to solver tolerance
    np.testing.assert_allclose(x_free, x_dense, rtol=0, atol=1e-8)
