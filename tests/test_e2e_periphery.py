"""End-to-end: fiber/body inside a spherical periphery.

Mirrors examples/stokes_tests/fiber_const_force_in_sphere: precompute the
shell operators, run the coupled solve, and verify the physics the
formulation actually provides:

- constant motor forces are treated as fiber-internal and are NOT radiated
  to other objects (parity with the reference — its prep_state skips them,
  system.cpp:424 "explicitly handled elsewhere" = the fiber's own RHS only),
  so a motor-driven straight fiber translates at its free SBT velocity
  regardless of confinement;
- forces that DO radiate couple for real: a bent fiber's elastic forces
  excite a shell density that enforces no-slip at the wall, and a body's
  external force feels the classic concentric-cavity drag enhancement
  (Cunningham's expansion)."""

import numpy as np
import pytest

import jax.numpy as jnp

from skellysim_tpu.config import Body, Config, Fiber, Periphery
from skellysim_tpu.io import tomlio
from skellysim_tpu.io.trajectory import TrajectoryReader
from skellysim_tpu.precompute.main import precompute_body, precompute_periphery
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

    # Motor forces are fiber-internal (never radiated — reference
    # system.cpp:416-425), and a straight fiber's solution forces are zero,
    # so the shell density stays zero and the fiber translates at its free
    # SBT velocity regardless of confinement. 2% covers the 8-node
    # discretization error of the SBT drag.
    assert abs(v_conf / v_free - 1) < 0.02
    assert float(np.linalg.norm(np.asarray(system.shell.state.solution))) < 1e-8


def test_bent_fiber_excites_shell_no_slip(sim_dir):
    """A curved fiber's elastic forces DO radiate; the solved shell density
    must cancel the resulting flow at the wall (no-slip)."""
    config = _config(radius=4.0)
    config.params.t_final = 2e-4
    config.params.dt_write = 1e-4
    n = 8
    s = np.linspace(-0.5, 0.5, n)
    arc = np.stack([1.0 + 0.25 * np.sin(np.pi * s), np.zeros(n), 0.75 * s],
                   axis=1)
    config.fibers[0].force_scale = 0.0
    config.fibers[0].x = arc.ravel().tolist()
    config.save("skelly_config.toml")
    cfg = tomlio.load("skelly_config.toml")
    precompute_periphery(cfg)
    system = System(cfg)
    system.run()

    assert float(np.linalg.norm(np.asarray(system.shell.state.solution))) > 1e-3

    # total field (fiber + shell double layer) must decay toward the wall:
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


def test_confinement_increases_body_drag(sim_dir):
    """Concentric sphere-in-cavity mobility: v/v_free = 1 − (9/4)σ + (5/2)σ³
    + O(σ⁵), σ = a_eff/R_eff (Cunningham 1910). The body's external force
    radiates to the shell in prep (reference system.cpp:429-443), the shell
    density cancels it at the wall, and its back-flow slows the body."""
    vels = {}
    for radius in (2.0, 4.0, None):
        config = Config()
        config.params.eta = 1.0
        config.params.dt_initial = 1e-4
        config.params.dt_min = 1e-5
        config.params.dt_max = 1e-4
        config.params.dt_write = 1e-4
        config.params.t_final = 2e-4
        config.params.gmres_tol = 1e-10
        config.params.adaptive_timestep_flag = False
        config.params.pair_evaluator = "direct"
        config.bodies = [Body(position=[0.0, 0.0, 0.0], shape="sphere",
                              radius=0.5, n_nodes=400,
                              external_force=[0.0, 0.0, 1.0],
                              precompute_file="body_precompute.npz")]
        if radius is not None:
            config.periphery = Periphery(
                n_nodes=N_SHELL, shape="sphere", radius=radius,
                precompute_file="periphery_precompute.npz")
        config.save("skelly_config.toml")
        cfg = tomlio.load("skelly_config.toml")
        precompute_body(cfg["bodies"][0])
        precompute_periphery(cfg)
        system = System(cfg)
        p0 = np.asarray(system.bodies.states()[0].position).copy()
        system.step()
        p1 = np.asarray(system.bodies.states()[0].position)
        vels[radius] = float((p1 - p0)[2]) / 1e-4
        import os

        for f in ("skelly_sim.out", "skelly_sim.out.cindex"):
            if os.path.exists(f):
                os.remove(f)

    a_eff = float(np.linalg.norm(
        np.load("body_precompute.npz")["node_positions_ref"][0]))
    for radius in (2.0, 4.0):
        sigma = a_eff / (radius * 1.04)   # periphery node scale factor
        expected = 1 - 2.25 * sigma + 2.5 * sigma**3
        measured = vels[radius] / vels[None]
        assert abs(measured / expected - 1) < 5e-3, \
            f"R={radius}: ratio {measured} vs Cunningham {expected}"
    assert vels[2.0] < vels[4.0] < vels[None]


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
