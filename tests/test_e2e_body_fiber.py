"""End-to-end body↔fiber coupling (link conditions).

A fiber bound to a nucleation site on a rigid sphere: the clamped-end
constraint must keep the fiber pinned and co-moving with the body, forces
must be transmitted both ways, and the force-free assembly must stay still."""

import numpy as np
import pytest

from skellysim_tpu.config import Body, Config, Fiber
from skellysim_tpu.io import tomlio
from skellysim_tpu.precompute.main import precompute_body
from skellysim_tpu.system import System

N_NODES = 400


@pytest.fixture
def sim_dir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _setup(sim_dir, body_force=(0, 0, 0), fiber_force_scale=0.0):
    config = Config()
    config.params.eta = 1.0
    config.params.dt_initial = 0.005
    config.params.dt_min = 1e-5
    config.params.dt_max = 0.005
    config.params.dt_write = 0.005
    config.params.t_final = 0.02
    config.params.gmres_tol = 1e-11
    config.params.pair_evaluator = "direct"

    radius = 0.5
    site = [0.0, 0.0, radius]  # nucleation site at the north pole
    config.bodies = [Body(
        shape="sphere", radius=radius, n_nodes=N_NODES,
        position=[0.0, 0.0, 0.0], external_force=list(body_force),
        nucleation_sites=site, precompute_file="body_precompute.npz",
    )]
    length = 1.0
    fib = Fiber(force_scale=fiber_force_scale, length=length, n_nodes=16,
                bending_rigidity=0.0025, parent_body=0, parent_site=0)
    fib.fill_node_positions(np.array(site), np.array([0.0, 0.0, 1.0]))
    config.fibers = [fib]
    config.save("skelly_config.toml")
    cfg = tomlio.load("skelly_config.toml")
    precompute_body(cfg["bodies"][0])
    return System(cfg)


def test_force_free_assembly_stays_still(sim_dir):
    system = _setup(sim_dir)
    system.run()
    assert np.linalg.norm(np.asarray(system.bodies.bodies[0].state.position)) < 1e-8
    x = np.asarray(system.fibers.blocks[0].x[0])
    assert abs(x[0, 2]) - 0.5 < 1e-8  # minus end still on the site


def test_fiber_stays_pinned_while_body_dragged(sim_dir):
    system = _setup(sim_dir, body_force=(0.0, 0.0, -0.5))
    system.run()
    body = system.bodies.bodies[0].state
    pos = np.asarray(body.position)
    assert pos[2] < -1e-4  # body moved with the force
    # attached fiber's minus end must sit exactly on the (moved) site
    x0 = np.asarray(system.fibers.blocks[0].x[0, 0])
    site = pos + np.array([0.0, 0.0, 0.5])
    np.testing.assert_allclose(x0, site, atol=1e-6)
    # the fiber co-moves: plus end displaced in the same direction
    xe = np.asarray(system.fibers.blocks[0].x[0, -1])
    assert xe[2] < 1.5  # started at 0.5 + 1.0


def test_fiber_motor_force_drags_body(sim_dir):
    # tangential motor force along +z on the fiber pushes the assembly
    system = _setup(sim_dir, fiber_force_scale=0.5)
    system.run()
    body = system.bodies.bodies[0].state
    assert float(np.asarray(body.velocity)[2]) > 1e-4
    # assembly moves together: fiber minus end tracks the site
    x0 = np.asarray(system.fibers.blocks[0].x[0, 0])
    site = np.asarray(body.position) + np.array([0.0, 0.0, 0.5])
    np.testing.assert_allclose(x0, site, atol=1e-6)
