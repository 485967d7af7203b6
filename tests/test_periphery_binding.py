"""Periphery binding: plus ends near the cortex become hinged.

Reference semantics (Fiber::update_boundary_conditions,
fiber_finite_difference.cpp:74-91): when binding is active and a fiber
reaches within `threshold` of the shell inside the polar-angle window, its
plus end switches to the Velocity/Torque (hinged) condition — the end is
pinned while the fiber can pivot."""

import numpy as np
import pytest

from skellysim_tpu.config import Config, Fiber, Periphery
from skellysim_tpu.io import tomlio
from skellysim_tpu.precompute.main import precompute_periphery
from skellysim_tpu.system import System


@pytest.fixture
def sim_dir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _run(sim_dir, binding_active):
    config = Config()
    config.params.eta = 1.0
    config.params.dt_initial = 1e-3
    config.params.dt_min = 1e-4
    config.params.dt_max = 1e-3
    config.params.dt_write = 1e-3
    config.params.t_final = 5e-3
    config.params.gmres_tol = 1e-9
    config.params.adaptive_timestep_flag = False
    config.params.pair_evaluator = "direct"
    config.params.periphery_binding.active = binding_active
    config.params.periphery_binding.threshold = 0.4
    # fiber along +z ending close to the wall (attachment radius 2.0)
    fib = Fiber(force_scale=0.31, length=0.75, n_nodes=8, bending_rigidity=0.0025)
    fib.fill_node_positions(np.array([0.0, 0.0, 1.1]), np.array([0.0, 0.0, 1.0]))
    config.fibers = [fib]
    config.periphery = Periphery(n_nodes=500, shape="sphere", radius=2.0,
                                 precompute_file="peri.npz")
    config.save("skelly_config.toml")
    cfg = tomlio.load("skelly_config.toml")
    precompute_periphery(cfg)
    system = System(cfg)
    z_plus_0 = float(np.asarray(system.fibers.blocks[0].x[0, -1, 2]))
    system.run()
    z_plus = float(np.asarray(system.fibers.blocks[0].x[0, -1, 2]))
    return z_plus - z_plus_0


def test_hinged_end_is_pinned(sim_dir):
    # plus end starts at z=1.85 with wall attachment radius 2.0 → within the
    # 0.4 binding threshold → hinged: the tangential force cannot advance it
    moved_hinged = _run(sim_dir, binding_active=True)
    assert abs(moved_hinged) < 1e-6, f"hinged end moved {moved_hinged}"


def test_unbound_end_moves(sim_dir):
    moved_free = _run(sim_dir, binding_active=False)
    assert moved_free > 1e-4, f"free end should advance, moved {moved_free}"
