"""Golden-trajectory regression: body + clamped-fiber compression.

Analogue of the reference's regression_tests/test_body_fdfiber_compression:
a slightly bent fiber under compressive motor force attached to a rigid
sphere, run deterministically and compared against stored final state
(tests/golden/body_fiber_compression.npz). Guards the full coupled pipeline
against silent behavior changes. Regenerate the golden only for intentional
physics changes (see the generator recipe in the git history)."""

import os

import numpy as np
import pytest

from skellysim_tpu.config import Body, Config, Fiber
from skellysim_tpu.io import tomlio
from skellysim_tpu.precompute.main import precompute_body
from skellysim_tpu.system import System

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "body_fiber_compression.npz")


@pytest.fixture
def sim_dir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def test_body_fiber_compression_matches_golden(sim_dir):
    config = Config()
    config.params.eta = 1.0
    config.params.dt_initial = 0.005
    config.params.dt_min = 1e-5
    config.params.dt_max = 0.005
    config.params.dt_write = 0.01
    config.params.t_final = 0.05
    config.params.gmres_tol = 1e-11
    config.params.pair_evaluator = "direct"
    radius = 0.5
    config.bodies = [Body(shape="sphere", radius=radius, n_nodes=300,
                          nucleation_sites=[0.0, 0.0, radius],
                          precompute_file="body_precompute.npz")]
    fib = Fiber(force_scale=-0.4, length=1.0, n_nodes=16, bending_rigidity=0.0025,
                parent_body=0, parent_site=0)
    t = np.linspace(0, 1.0, 16)
    x = np.stack([0.02 * np.sin(np.pi * t), np.zeros_like(t), radius + t], axis=1)
    fib.x = x.ravel().tolist()
    config.fibers = [fib]
    config.save("skelly_config.toml")
    cfg = tomlio.load("skelly_config.toml")
    precompute_body(cfg["bodies"][0])
    system = System(cfg)
    system.run()

    gold = np.load(GOLDEN)
    assert system.time == pytest.approx(float(gold["time"]), abs=1e-12)
    np.testing.assert_allclose(np.asarray(system.fibers.blocks[0].x[0]),
                               gold["fiber_x"], atol=1e-9)
    np.testing.assert_allclose(np.asarray(system.fibers.blocks[0].tension[0]),
                               gold["fiber_tension"], atol=1e-7)
    np.testing.assert_allclose(np.asarray(system.bodies.bodies[0].state.position),
                               gold["body_position"], atol=1e-10)
    np.testing.assert_allclose(np.asarray(system.bodies.bodies[0].state.orientation),
                               gold["body_orientation"], atol=1e-10)
