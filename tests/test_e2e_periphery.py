"""End-to-end: fiber inside a spherical periphery.

Mirrors examples/stokes_tests/fiber_const_force_in_sphere: precompute the
shell operators, run the coupled fiber+shell solve, and verify the physics:
confinement increases drag relative to the unbounded case, and the solved
double-layer density cancels the fiber's flow at the wall (no-slip)."""

import numpy as np
import pytest

import jax.numpy as jnp

from skellysim_tpu.config import Config, Fiber, Periphery
from skellysim_tpu.io import tomlio
from skellysim_tpu.io.trajectory import TrajectoryReader
from skellysim_tpu.precompute.main import precompute_periphery
from skellysim_tpu.system import System

N_SHELL = 600  # small for test speed; accuracy scales with node count


@pytest.fixture
def sim_dir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _config(radius=4.0):
    config = Config()
    config.params.eta = 1.0
    config.params.dt_initial = 1e-4
    config.params.dt_min = 1e-5
    config.params.dt_max = 1e-4
    config.params.dt_write = 2e-4
    config.params.t_final = 1e-3
    config.params.gmres_tol = 1e-10
    config.params.adaptive_timestep_flag = False
    config.params.pair_evaluator = "direct"
    config.params.fiber_type = "FiniteDifference"

    length = 0.75
    fib = Fiber(force_scale=0.31, length=length, n_nodes=8, bending_rigidity=0.0025)
    fib.fill_node_positions(np.array([1.0, 0.0, 0.0]), np.array([0.0, 0.0, 1.0]))
    config.fibers = [fib]
    config.periphery = Periphery(n_nodes=N_SHELL, shape="sphere", radius=radius,
                                 precompute_file="periphery_precompute.npz")
    return config


def test_fiber_in_sphere(sim_dir):
    config = _config()
    config.save("skelly_config.toml")
    cfg = tomlio.load("skelly_config.toml")
    precompute_periphery(cfg)

    system = System(cfg)
    system.run()

    traj = TrajectoryReader("skelly_sim.out")
    traj.load_frame(0)
    x0, t0 = traj["fibers"][0]["x_"], traj["time"]
    traj.load_frame(-1)
    xf, tf = traj["fibers"][0]["x_"], traj["time"]
    v_conf = float(np.mean((xf - x0)[:, 2])) / (tf - t0)

    # unbounded SBT velocity for the same fiber
    fib = config.fibers[0]
    eps = fib.radius / fib.length
    gamma_free = -4 * np.pi * fib.length * config.params.eta / np.log(np.e * eps**2)
    v_free = fib.force_scale * fib.length / gamma_free

    # confinement slows the fiber, but at R/L > 5 only mildly
    assert 0.5 * v_free < v_conf < v_free

    # --- no-slip self-consistency near the wall ---
    # the total field (fiber + shell double layer) must decay toward the wall:
    # compare |u| on a ring near the wall to |u| on a ring near the fiber
    theta = np.linspace(0.3, np.pi - 0.3, 12)
    ring = lambda r: np.stack([r * np.sin(theta), np.zeros_like(theta),
                               r * np.cos(theta)], axis=1)
    Rw = 4.0 * 1.04  # physical node radius (periphery scale factor)
    u_wall = system.velocity_at_targets(ring(0.93 * Rw))
    u_near = system.velocity_at_targets(ring(1.6))
    ratio = (np.linalg.norm(u_wall, axis=1).max()
             / np.linalg.norm(u_near, axis=1).max())
    # free-space decay alone would give ~1.6/3.9 ≈ 0.41; the shell must
    # suppress the wall velocity well below that
    assert ratio < 0.15, f"no-slip violation ratio {ratio}"


def test_confinement_increases_drag(sim_dir):
    # tighter cavity -> slower fiber at the same force
    vels = {}
    for radius in (2.0, 4.0):
        config = _config(radius=radius)
        config.params.t_final = 3e-4
        config.params.dt_write = 1e-4
        config.save("skelly_config.toml")
        cfg = tomlio.load("skelly_config.toml")
        precompute_periphery(cfg)
        system = System(cfg)
        system.run()
        traj = TrajectoryReader("skelly_sim.out")
        traj.load_frame(0)
        x0, t0 = traj["fibers"][0]["x_"], traj["time"]
        traj.load_frame(-1)
        xf, tf = traj["fibers"][0]["x_"], traj["time"]
        vels[radius] = float(np.mean((xf - x0)[:, 2])) / (tf - t0)
        import os

        os.remove("skelly_sim.out")
        os.remove("skelly_sim.out.cindex")
    assert vels[2.0] < vels[4.0]


def test_device_built_shell_matches_precompute(sim_dir):
    """Device-side operator assembly (shell_from_geometry) must reproduce the
    offline precompute exactly and run the coupled solve."""
    import jax.numpy as jnp

    from skellysim_tpu.periphery import shell as shell_ops

    config = _config()
    config.params.t_final = 2e-4
    config.params.dt_write = 1e-4
    config.save("skelly_config.toml")
    cfg = tomlio.load("skelly_config.toml")
    out = precompute_periphery(cfg)
    sh = shell_ops.shell_from_geometry(cfg["periphery"], dtype=jnp.float64)
    # device build stores the operators component-major; permute to node-major
    N = sh.state.n_nodes
    t = np.arange(3 * N)
    q = (t % 3) * N + t // 3     # node-major index -> component-major index
    A_nm = np.asarray(sh.state.A)[np.ix_(q, q)]
    np.testing.assert_allclose(A_nm, out["stresslet_plus_complementary"], atol=1e-12)
    M_nm = np.asarray(sh.state.M_inv)[np.ix_(q, q)]
    np.testing.assert_allclose(M_nm, out["M_inv"], atol=1e-8)

    cfg["periphery"]["build_on_device"] = True
    system = System(cfg)
    system.run()
    assert np.isfinite(system.curr_solution).all()
