"""Clamped-fiber buckling Hopf bifurcation.

Port of tests/combined/test_clamped_buckling_sigma{72,80}.py: a clamped
fiber under compressive motor force σ = f L³/E shows decaying transverse
oscillations below the bifurcation (σ=72) and growing oscillations above it
(σ=80, threshold σ≈76). This exercises the full implicit machinery: clamped
BCs, motor forcing, adaptive dt, self-hydrodynamics, and a transient point
source kick."""

import numpy as np
import pytest
from scipy.signal import find_peaks

from skellysim_tpu.config import Config, Fiber, Point
from skellysim_tpu.io import tomlio
from skellysim_tpu.io.trajectory import TrajectoryReader
from skellysim_tpu.system import System


@pytest.fixture
def sim_dir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _run_buckling(sigma: float):
    config = Config()
    config.params.eta = 1.0
    config.params.dt_initial = 0.02
    config.params.dt_min = 0.01
    config.params.dt_max = 0.1
    config.params.dt_write = 0.1
    config.params.t_final = 50.0
    config.params.gmres_tol = 1e-10
    config.params.seed = 130319
    config.params.pair_evaluator = "direct"
    config.params.adaptive_timestep_flag = True

    length, E, n = 1.0, 0.0025, 32
    fib = Fiber(force_scale=-sigma * E / length**3, length=length, n_nodes=n,
                bending_rigidity=E, minus_clamped=True)
    fib.x = np.linspace([0, 0, 0], [0, 0, length], n).ravel().tolist()
    config.fibers = [fib]
    # transient kick to excite the transverse mode
    config.point_sources = [Point(position=[0.0, 0.0, 10 * length],
                                  force=[10.0, 0.0, 0.0], time_to_live=1.0)]
    config.save("skelly_config.toml")
    System(tomlio.load("skelly_config.toml")).run()

    traj = TrajectoryReader("skelly_sim.out")
    xs = []
    for i in range(len(traj)):
        traj.load_frame(i)
        xs.append(traj["fibers"][0]["x_"][-1, 0])  # plus-end transverse deflection
    return np.abs(np.array(xs))


def _peak_amplitudes(deflection):
    peaks, _ = find_peaks(deflection)
    return deflection[peaks]


def test_subcritical_sigma72_decays(sim_dir):
    amps = _peak_amplitudes(_run_buckling(72.0))
    assert len(amps) >= 3
    # oscillation envelope decays after the initial transient
    assert amps[-1] < amps[1]
    assert np.all(np.diff(amps[1:]) < 0)


def test_supercritical_sigma80_grows(sim_dir):
    amps = _peak_amplitudes(_run_buckling(80.0))
    assert len(amps) >= 3
    assert amps[-1] > amps[1]
    assert np.all(np.diff(amps[1:]) > 0)
