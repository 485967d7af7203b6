"""End-to-end surface-of-revolution periphery (oocyte-class geometry).

A scaled-down oocyte envelope (the reference's examples/oocyte height
function) with a clamped fiber inside: precompute must produce a
well-conditioned second-kind operator and the coupled solve must run with the
generic-periphery runtime path."""

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


def _oocyte_envelope(length=7.5, T=0.72, p1=0.4, p2=0.2):
    return {
        "height": "0.5 * T * ((1 + 2*x/length)**p1) * ((1 - 2*x/length)**p2) * length",
        "T": T, "p1": p1, "p2": p2, "length": length,
        "lower_bound": -length / 2, "upper_bound": length / 2,
        "n_nodes_target": 700,
    }


def test_revolution_precompute_and_solve(sim_dir):
    config = Config()
    config.params.eta = 1.0
    config.params.dt_initial = 1e-3
    config.params.dt_min = 1e-4
    config.params.dt_max = 1e-3
    config.params.dt_write = 1e-3
    config.params.t_final = 2e-3
    config.params.gmres_tol = 1e-8
    config.params.pair_evaluator = "direct"
    config.periphery = Periphery(shape="surface_of_revolution", n_nodes=700,
                                 envelope=_oocyte_envelope(),
                                 precompute_file="periphery_precompute.npz")
    fib = Fiber(force_scale=0.1, length=1.0, n_nodes=16, bending_rigidity=0.0025)
    # slightly bent fiber: bending forces source a nonzero flow at the shell
    t = np.linspace(0, 1.0, 16)
    x = np.stack([t, 0.03 * np.sin(2 * np.pi * t), np.zeros_like(t)], axis=1)
    fib.x = x.ravel().tolist()
    config.fibers = [fib]
    config.save("skelly_config.toml")
    cfg = tomlio.load("skelly_config.toml")

    out = precompute_periphery(cfg)
    N = out["nodes"].shape[0]
    assert cfg["periphery"]["n_nodes"] == N
    # operator is invertible and M_inv really is its inverse
    err = np.linalg.norm(out["M_inv"] @ out["stresslet_plus_complementary"]
                         - np.eye(3 * N)) / np.sqrt(3 * N)
    assert err < 1e-8
    # quadrature sanity: total area within a few % of a numerical reference
    from scipy.integrate import quad
    L, T, p1, p2 = 7.5, 0.72, 0.4, 0.2
    h = lambda x: 0.5 * T * ((1 + 2 * x / L) ** p1) * ((1 - 2 * x / L) ** p2) * L
    eps = 1e-9
    dh = lambda x: (h(x + eps) - h(x - eps)) / (2 * eps)
    area = quad(lambda x: 2 * np.pi * h(x) * np.sqrt(1 + dh(x) ** 2),
                -L / 2 + 1e-6, L / 2 - 1e-6, limit=200)[0]
    # nodes are scaled by the periphery scale factor 1.04 => area × 1.04²
    assert out["quadrature_weights"].sum() == pytest.approx(area * 1.04**2, rel=0.02)

    system = System(cfg)
    system.run()
    assert np.isfinite(system.curr_solution).all()
    # the shell responded to the fiber's motion
    assert np.linalg.norm(system.curr_solution[system.fiber_solution_size():]) > 0
