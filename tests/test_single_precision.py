"""Single-precision (TPU production) solve path: end-to-end physics within
f32-appropriate tolerance, against both theory and the f64 path."""

import numpy as np
import pytest

from skellysim_tpu.config import Config, Fiber
from skellysim_tpu.io import tomlio
from skellysim_tpu.io.trajectory import TrajectoryReader
from skellysim_tpu.system import System


@pytest.fixture
def sim_dir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _drag_error(precision: str, gmres_tol: float) -> float:
    config = Config()
    config.params.eta = 0.7
    config.params.dt_initial = 1e-4
    config.params.dt_min = 1e-4
    config.params.dt_max = 1e-4
    config.params.dt_write = 1e-3
    config.params.t_final = 5e-3
    config.params.gmres_tol = gmres_tol
    config.params.pair_evaluator = "direct"
    config.params.precision = precision
    fib = Fiber(force_scale=0.31, length=0.75, n_nodes=8, bending_rigidity=0.0025)
    fib.fill_node_positions(np.array([0.0, 0.0, 0.0]), np.array([0.0, 0.0, 1.0]))
    config.fibers = [fib]
    config.save("skelly_config.toml")
    system = System(tomlio.load("skelly_config.toml"))
    system.run()

    traj = TrajectoryReader("skelly_sim.out")
    traj.load_frame(0)
    x0, t0 = traj["fibers"][0]["x_"], traj["time"]
    traj.load_frame(-1)
    xf, tf = traj["fibers"][0]["x_"], traj["time"]
    v = float(np.mean((xf - x0)[:, 2])) / (tf - t0)
    eps = fib.radius / fib.length
    gamma_theory = -4 * np.pi * fib.length * 0.7 / np.log(np.e * eps**2)
    gamma = fib.force_scale * fib.length / v
    return abs(1 - gamma / gamma_theory)


def test_single_precision_drag(sim_dir):
    err = _drag_error("single", 1e-5)
    # f32 arithmetic + looser GMRES: expect ~1e-4-class accuracy
    assert err < 5e-3, f"f32 drag error {err}"


def test_single_precision_state_dtypes(sim_dir):
    config = Config()
    config.params.precision = "single"
    config.params.t_final = 1e-4
    config.params.dt_initial = 1e-4
    config.params.dt_min = 1e-5
    config.params.gmres_tol = 1e-5
    fib = Fiber(length=1.0, n_nodes=8)
    fib.fill_node_positions(np.zeros(3), np.array([0.0, 0.0, 1.0]))
    config.fibers = [fib]
    config.save("skelly_config.toml")
    system = System(tomlio.load("skelly_config.toml"))
    system.step()
    assert system.fibers.blocks[0].x.dtype == np.float32
    assert system.curr_solution.dtype == np.float32
