"""End-to-end: single free fiber under constant tangential force.

Port of the reference's tests/combined/test_fiber_const_force.py:12-77 —
generate a config through the typed config API, run the full system (implicit
solve + time loop + trajectory writes), read the trajectory back, and compare
the measured drag to the slender-body analytic value
γ = −4πLη / ln(e ε²), requiring relative error < 1e-6."""

import numpy as np
import pytest

from skellysim_tpu.config import Config, Fiber
from skellysim_tpu.io.trajectory import TrajectoryReader
from skellysim_tpu.system import System


@pytest.fixture
def sim_dir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _make_config():
    config = Config()
    config.params.eta = 0.7
    config.params.dt_initial = 1e-4
    config.params.dt_min = 1e-4
    config.params.dt_max = 1e-4
    config.params.dt_write = 1e-3
    config.params.t_final = 1e-2
    config.params.gmres_tol = 1e-10
    config.params.seed = 130319
    config.params.pair_evaluator = "direct"
    config.params.fiber_type = "FiniteDifference"

    length = 0.75
    fib = Fiber(force_scale=0.31, length=length, n_nodes=8, bending_rigidity=0.0025)
    fib.fill_node_positions(np.array([0.0, 0.0, 0.0]), np.array([0.0, 0.0, 1.0]))
    config.fibers = [fib]
    return config


def test_fiber_const_force_drag(sim_dir):
    config = _make_config()
    config.save(sim_dir / "skelly_config.toml")

    from skellysim_tpu.io import tomlio

    system = System(tomlio.load(sim_dir / "skelly_config.toml"))
    system.run()

    traj = TrajectoryReader("skelly_sim.out")
    assert len(traj) >= 2

    traj.load_frame(0)
    x0 = traj["fibers"][0]["x_"]
    t0 = traj["time"]
    traj.load_frame(-1)
    xf = traj["fibers"][0]["x_"]
    tf = traj["time"]

    v = (xf - x0) / (tf - t0)
    v_z = float(np.mean(v[:, 2]))

    fib = config.fibers[0]
    epsilon = fib.radius / fib.length
    gamma = fib.force_scale * fib.length / v_z
    gamma_theory = -4 * np.pi * fib.length * config.params.eta / np.log(np.e * epsilon**2)
    rel_error = abs(1 - gamma / gamma_theory)
    assert rel_error < 1e-6, f"drag {gamma} vs theory {gamma_theory}: rel err {rel_error}"


def test_trajectory_roundtrip_and_resume(sim_dir):
    config = _make_config()
    config.params.t_final = 2e-3
    config.save(sim_dir / "skelly_config.toml")

    from skellysim_tpu.io import tomlio

    system = System(tomlio.load(sim_dir / "skelly_config.toml"))
    system.run()
    traj = TrajectoryReader("skelly_sim.out")
    n_frames_before = len(traj)
    t_before = traj.times[-1]

    # resume and extend the run
    system2 = System(tomlio.load(sim_dir / "skelly_config.toml"), resume=True)
    assert abs(system2.time - t_before) < 1e-12
    system2.params.t_final = 4e-3
    system2.run()

    traj2 = TrajectoryReader("skelly_sim.out")
    assert len(traj2) > n_frames_before
    assert traj2.times == sorted(traj2.times)
    # the resumed trajectory must continue smoothly (velocity roughly constant)
    traj2.load_frame(-1)
    xf = traj2["fibers"][0]["x_"]
    assert np.all(np.isfinite(xf))
