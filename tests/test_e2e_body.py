"""End-to-end rigid-body tests.

Ports of the reference's tests/combined/test_body_const_force.py and
test_body_const_torque.py: a free rigid sphere under constant force must
translate at the Stokes mobility v = F/(6πηR), and under constant torque
rotate at Ω = L/(8πηR³), with R the effective (precompute-node) radius.
Tolerance 1e-6 relative, matching the reference."""

import numpy as np
import pytest

from skellysim_tpu.config import Body, Config
from skellysim_tpu.io import tomlio
from skellysim_tpu.io.trajectory import TrajectoryReader
from skellysim_tpu.precompute.main import precompute_body
from skellysim_tpu.system import System

N_NODES = 600


@pytest.fixture
def sim_dir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _run(sim_dir, force=(0.0, 0.0, 0.0), torque=(0.0, 0.0, 0.0), t_final=0.4):
    config = Config()
    config.params.eta = 0.9
    config.params.dt_initial = 0.1
    config.params.dt_min = 1e-4
    config.params.dt_max = 0.1
    config.params.dt_write = 0.1
    config.params.t_final = t_final
    config.params.gmres_tol = 1e-12
    config.params.pair_evaluator = "direct"
    config.bodies = [Body(
        shape="sphere", radius=0.5, n_nodes=N_NODES,
        position=[0.0, 0.0, 0.0],
        external_force=list(force), external_torque=list(torque),
        precompute_file="body_precompute.npz",
    )]
    config.save("skelly_config.toml")
    cfg = tomlio.load("skelly_config.toml")
    precompute_body(cfg["bodies"][0])
    system = System(cfg)
    system.run()
    return system, cfg


def test_body_const_force_stokes_mobility(sim_dir):
    system, cfg = _run(sim_dir, force=(0.0, 0.0, 1.5))
    traj = TrajectoryReader("skelly_sim.out")
    traj.load_frame(0)
    z0, t0 = traj["bodies"][0][0]["position_"][2], traj["time"]
    traj.load_frame(-1)
    zf, tf = traj["bodies"][0][0]["position_"][2], traj["time"]

    pre = np.load("body_precompute.npz")
    R_eff = float(np.linalg.norm(pre["node_positions_ref"][0]))
    eta = 0.9
    v_theory = 1.5 / (6 * np.pi * eta * R_eff)
    v_measured = (zf - z0) / (tf - t0)
    rel = abs(1 - v_measured / v_theory)
    assert rel < 1e-6, f"v={v_measured} vs {v_theory} (rel {rel})"


def test_body_const_torque_rotational_mobility(sim_dir):
    system, cfg = _run(sim_dir, torque=(0.0, 0.0, 0.02), t_final=0.2)
    # angular velocity from the live state (orientation change is harder to
    # read off); Stokes rotational drag 8πηR³
    pre = np.load("body_precompute.npz")
    R_eff = float(np.linalg.norm(pre["node_positions_ref"][0]))
    w_theory = 0.02 / (8 * np.pi * 0.9 * R_eff**3)
    w_measured = float(np.asarray(system.bodies.bodies[0].state.angular_velocity)[2])
    rel = abs(1 - w_measured / w_theory)
    assert rel < 1e-4, f"w={w_measured} vs {w_theory} (rel {rel})"
    # translation must stay zero
    assert np.linalg.norm(np.asarray(system.bodies.bodies[0].state.position)) < 1e-10
