"""End-to-end ellipsoidal-body mobility.

Port of tests/combined/bodies/test_ellipsoid_prolate_z_force.py: a prolate
spheroid settling along its symmetry axis must match the analytic Oberbeck
drag v = F (1+e²)ln((1+e)/(1−e)) − 2e) / (16πηa e³), rel. error < 1e-3."""

import numpy as np
import pytest

from skellysim_tpu.config import Body, Config
from skellysim_tpu.io import tomlio
from skellysim_tpu.io.trajectory import TrajectoryReader
from skellysim_tpu.precompute.main import precompute_body
from skellysim_tpu.system import System


@pytest.fixture
def sim_dir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_prolate_spheroid_axial_mobility(sim_dir):
    radius = 0.5
    config = Config()
    config.params.eta = 0.9
    config.params.dt_initial = 0.1
    config.params.dt_min = 1e-4
    config.params.dt_max = 0.1
    config.params.dt_write = 0.1
    config.params.t_final = 0.5
    config.params.gmres_tol = 1e-11
    config.params.pair_evaluator = "direct"
    config.bodies = [Body(
        shape="ellipsoid", n_nodes=600,
        axis_length=[radius * 0.9, radius * 0.9, radius],
        position=[0.0, 0.0, 0.0], external_force=[0.0, 0.0, 1.5],
        precompute_file="body_precompute.npz",
    )]
    config.save("skelly_config.toml")
    cfg = tomlio.load("skelly_config.toml")
    precompute_body(cfg["bodies"][0])
    system = System(cfg)
    system.run()

    traj = TrajectoryReader("skelly_sim.out")
    traj.load_frame(0)
    z0, t0 = traj["bodies"][2][0]["position_"][2], traj["time"]
    traj.load_frame(-1)
    zf, tf = traj["bodies"][2][0]["position_"][2], traj["time"]
    v_measured = (zf - z0) / (tf - t0)

    pre = np.load("body_precompute.npz")
    radii = np.linalg.norm(pre["node_positions_ref"], axis=1)
    a, b = radii.max(), radii.min()
    e = np.sqrt(1 - (b / a) ** 2)
    eta, force = 0.9, 1.5
    v_parallel = force / (16 * np.pi * eta * a * e**3
                          / ((1 + e**2) * np.log((1 + e) / (1 - e)) - 2 * e))
    rel = abs(1 - v_measured / v_parallel)
    assert rel < 1e-3, f"v={v_measured} vs {v_parallel} (rel {rel})"
