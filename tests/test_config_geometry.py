"""Config-side geometry helpers: surface placement, nucleation sites,
perturbed fiber shapes."""

import numpy as np
import pytest

from skellysim_tpu.config import (
    Body,
    Fiber,
    Periphery,
    perturbed_fiber_positions,
)


def test_move_fibers_to_sphere_surface():
    peri = Periphery(shape="sphere", radius=4.0)
    fibers = [Fiber(length=1.0, n_nodes=8) for _ in range(20)]
    peri.move_fibers_to_surface(fibers, ds_min=0.5, seed=1)
    ends = np.array([np.asarray(f.x).reshape(-1, 3)[0] for f in fibers])
    np.testing.assert_allclose(np.linalg.norm(ends, axis=1), 4.0, rtol=1e-12)
    # min separation honored
    d2 = np.sum((ends[:, None] - ends[None, :]) ** 2, axis=-1)
    np.fill_diagonal(d2, np.inf)
    assert d2.min() >= 0.5**2 - 1e-12
    # fibers point inward and are clamped
    for f in fibers:
        x = np.asarray(f.x).reshape(-1, 3)
        assert np.linalg.norm(x[-1]) < np.linalg.norm(x[0])
        assert f.minus_clamped


def test_move_fibers_to_ellipsoid_surface():
    peri = Periphery(shape="ellipsoid", a=3.0, b=2.0, c=1.5)
    fibers = [Fiber(length=0.5, n_nodes=8) for _ in range(10)]
    peri.move_fibers_to_surface(fibers, ds_min=0.3, seed=2)
    for f in fibers:
        x0 = np.asarray(f.x).reshape(-1, 3)[0]
        lvl = (x0[0] / 3.0) ** 2 + (x0[1] / 2.0) ** 2 + (x0[2] / 1.5) ** 2
        assert abs(lvl - 1.0) < 1e-10


def test_move_fibers_to_revolution_surface():
    env = {"height": "0.5 * (1 - (2*x/7.5)**2) * 7.5 * 0.3", "lower_bound": -3.75,
           "upper_bound": 3.75}
    peri = Periphery(shape="surface_of_revolution", envelope=env)
    fibers = [Fiber(length=0.4, n_nodes=8) for _ in range(8)]
    peri.move_fibers_to_surface(fibers, ds_min=0.3, seed=3)
    for f in fibers:
        x0 = np.asarray(f.x).reshape(-1, 3)[0]
        r = np.hypot(x0[1], x0[2])
        h = 0.5 * (1 - (2 * x0[0] / 7.5) ** 2) * 7.5 * 0.3
        assert abs(r - h) < 0.02  # interpolated surface


def test_nucleation_sites_on_sphere():
    body = Body(shape="sphere", radius=0.5, n_nucleation_sites=12,
                position=[1.0, 0.0, 0.0])
    body.generate_nucleation_sites(ds_min=0.2, seed=4)
    sites = np.asarray(body.nucleation_sites).reshape(-1, 3)
    assert sites.shape == (12, 3)
    np.testing.assert_allclose(np.linalg.norm(sites - [1, 0, 0], axis=1), 0.5,
                               rtol=1e-12)


def test_perturbed_fiber_positions_arclength():
    x = perturbed_fiber_positions(0.05, 1.0, np.zeros(3), np.array([0, 0, 1.0]),
                                  32, rng=np.random.default_rng(0))
    assert x.shape == (32, 3)
    seg = np.linalg.norm(np.diff(x, axis=0), axis=1)
    # total arclength == fiber length, uniform node spacing
    assert abs(seg.sum() - 1.0) < 1e-3
    assert seg.std() / seg.mean() < 0.02
    # perturbation is orthogonal to the axis and cosine-shaped (zero at ends)
    assert abs(x[0][2]) < 1e-12 and abs(np.linalg.norm(x[-1][:2])) < 1e-9


def test_compat_timestep_clock(tmp_path, monkeypatch):
    """compat_timestep_clock reproduces the reference's time accounting
    (time advances by the NEW dt during growth, system.cpp:554-560);
    default mode advances by the dt that produced the state."""
    import numpy as np

    from skellysim_tpu.config import Config, Fiber
    from skellysim_tpu.io import tomlio
    from skellysim_tpu.system import System

    monkeypatch.chdir(tmp_path)

    def run(compat):
        config = Config()
        config.params.eta = 1.0
        config.params.dt_initial = 1e-4
        config.params.dt_min = 1e-5
        config.params.dt_max = 1e-3
        config.params.beta_up = 1.5
        config.params.dt_write = 1.0   # no frames during the loop
        config.params.t_final = 4.5e-4
        config.params.gmres_tol = 1e-10
        config.params.adaptive_timestep_flag = True
        config.params.fiber_error_tol = 10.0   # always accept + grow
        config.params.pair_evaluator = "direct"
        fib = Fiber(force_scale=0.1, length=0.75, n_nodes=8,
                    bending_rigidity=0.0025)
        fib.fill_node_positions(np.array([0.0, 0.0, 0.0]),
                                np.array([0.0, 0.0, 1.0]))
        config.fibers = [fib]
        config.save("skelly_config.toml")
        cfg = tomlio.load("skelly_config.toml")
        cfg["params"]["compat_timestep_clock"] = compat
        s = System(cfg)
        s.run()
        import os
        for f in ("skelly_sim.out", "skelly_sim.out.cindex"):
            if os.path.exists(f):
                os.remove(f)
        return s.time

    # growth 1e-4 -> 1.5e-4 -> 2.25e-4 ...; physics clock: 1e-4+1.5e-4+2.25e-4
    # = 4.75e-4 > t_final after 3 steps. compat clock: 1.5e-4+2.25e-4+3.375e-4
    t_default = run(False)
    t_compat = run(True)
    assert abs(t_default - (1e-4 + 1.5e-4 + 2.25e-4)) < 1e-12
    assert abs(t_compat - (1.5e-4 + 2.25e-4)) < 1e-12 or \
        abs(t_compat - (1.5e-4 + 2.25e-4 + 3.375e-4)) < 1e-12
