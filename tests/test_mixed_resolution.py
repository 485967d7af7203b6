"""Mixed fiber resolutions in one simulation (multiple node-count blocks).

The reference holds a ragged per-fiber list; here fibers group into blocks by
node count. A sim mixing n=8 and n=16 fibers must run, couple, and write a
trajectory preserving the config order."""

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


def test_mixed_node_counts(sim_dir):
    config = Config()
    config.params.eta = 0.7
    config.params.dt_initial = 1e-4
    config.params.dt_min = 1e-4
    config.params.dt_max = 1e-4
    config.params.dt_write = 5e-4
    config.params.t_final = 2e-3
    config.params.gmres_tol = 1e-10
    config.params.pair_evaluator = "direct"

    # config order: 16-node, 8-node, 16-node — exercises permutation bookkeeping
    fibers = []
    for i, n in enumerate([16, 8, 16]):
        f = Fiber(force_scale=0.31, length=0.75, n_nodes=n, bending_rigidity=0.0025)
        f.fill_node_positions(np.array([2.0 * i, 0.0, 0.0]), np.array([0.0, 0.0, 1.0]))
        fibers.append(f)
    config.fibers = fibers
    config.save("skelly_config.toml")

    system = System(tomlio.load("skelly_config.toml"))
    assert len(system.fibers.blocks) == 2
    assert system.total_solution_size() == 4 * (16 + 8 + 16)
    system.run()

    traj = TrajectoryReader("skelly_sim.out")
    traj.load_frame(-1)
    fibs = traj["fibers"]
    assert [f["n_nodes_"] for f in fibs] == [16, 8, 16]
    # all fibers translate at (nearly) the same SBT drag velocity
    traj.load_frame(0)
    x0 = [traj["fibers"][i]["x_"].copy() for i in range(3)]
    t0 = traj["time"]
    traj.load_frame(-1)
    tf = traj["time"]
    vz = [float(np.mean((traj["fibers"][i]["x_"] - x0[i])[:, 2])) / (tf - t0)
          for i in range(3)]
    eps = 0.0125 / 0.75
    gamma = -4 * np.pi * 0.75 * 0.7 / np.log(np.e * eps**2)
    v_free = 0.31 * 0.75 / gamma
    for v in vz:
        # well-separated fibers: near-free drag with a small coupling correction
        assert abs(v / v_free - 1) < 0.2
    # the two 16-node fibers are symmetric about the middle one
    assert vz[0] == pytest.approx(vz[2], rel=1e-6)
