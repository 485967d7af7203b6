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


def _jeffery_integrals(a, b, c):
    """χ and α_i from the classical ellipsoid mobility theory (Oberbeck /
    Jeffery): χ = ∫dλ/Δ, α_i = ∫dλ/((a_i²+λ)Δ), Δ = √((a²+λ)(b²+λ)(c²+λ)).
    Sphere limits: χ = 2/R, α = 2/(3R³) → 6πηR and 8πηR³ drags."""
    from scipy.integrate import quad

    D = lambda lam: np.sqrt((a * a + lam) * (b * b + lam) * (c * c + lam))
    chi = quad(lambda lam: 1 / D(lam), 0, np.inf)[0]
    alpha = [quad(lambda lam: 1 / ((s * s + lam) * D(lam)), 0, np.inf)[0]
             for s in (a, b, c)]
    return chi, alpha


def _run_body(axes, force=(0, 0, 0), torque=(0, 0, 0), t_final=0.5):
    config = Config()
    config.params.eta = 0.9
    config.params.dt_initial = 0.1
    config.params.dt_min = 1e-4
    config.params.dt_max = 0.1
    config.params.dt_write = 0.1
    config.params.t_final = t_final
    config.params.gmres_tol = 1e-11
    config.params.pair_evaluator = "direct"
    config.bodies = [Body(
        shape="ellipsoid", n_nodes=600, axis_length=list(axes),
        position=[0.0, 0.0, 0.0], external_force=list(force),
        external_torque=list(torque),
        precompute_file="body_precompute.npz",
    )]
    config.save("skelly_config.toml")
    cfg = tomlio.load("skelly_config.toml")
    precompute_body(cfg["bodies"][0])
    system = System(cfg)
    system.run()
    return system


def _realized_axes(nominal):
    """Semi-axes of the quadrature surface the hydrodynamics actually sees:
    the nominal ellipsoid shrunk by the reference's body quadrature offset
    (precompute.main._body_effective_radius; body_spherical.cpp radius
    offsets)."""
    from skellysim_tpu.precompute.main import _body_effective_radius
    return [_body_effective_radius(r) for r in nominal]


def test_oblate_spheroid_axial_mobility(sim_dir):
    """Reference: bodies/test_ellipsoid_oblate_z_force.py — disc-like body
    settling along its short (symmetry) axis."""
    nominal = [0.5, 0.5, 0.3]
    system = _run_body(nominal, force=(0.0, 0.0, 1.5))
    traj = TrajectoryReader("skelly_sim.out")
    traj.load_frame(0)
    z0, t0 = traj["bodies"][2][0]["position_"][2], traj["time"]
    traj.load_frame(-1)
    zf, tf = traj["bodies"][2][0]["position_"][2], traj["time"]
    a, b, c = _realized_axes(nominal)
    chi, alpha = _jeffery_integrals(a, b, c)
    C_z = 16 * np.pi * 0.9 / (chi + c * c * alpha[2])
    v_theory = 1.5 / C_z
    v_measured = (zf - z0) / (tf - t0)
    rel = abs(1 - v_measured / v_theory)
    assert rel < 1e-3, f"v={v_measured} vs {v_theory} (rel {rel})"


def test_prolate_spheroid_axial_rotation(sim_dir):
    """Reference: bodies/test_ellipsoid_prolate_z_torque.py — rotation about
    the long axis; C_rot = 16πη(a²+b²)/(3(a²α_a + b²α_b))."""
    nominal = [0.45, 0.45, 0.5]
    system = _run_body(nominal, torque=(0.0, 0.0, 0.02), t_final=0.2)
    a, b, c = _realized_axes(nominal)
    chi, alpha = _jeffery_integrals(a, b, c)
    C_rot = 16 * np.pi * 0.9 * (a * a + b * b) / (
        3 * (a * a * alpha[0] + b * b * alpha[1]))
    w_theory = 0.02 / C_rot
    w_measured = float(np.asarray(
        system.bodies.bodies[0].state.angular_velocity)[2])
    rel = abs(1 - w_measured / w_theory)
    assert rel < 2e-3, f"w={w_measured} vs {w_theory} (rel {rel})"


def test_ellipsoid_as_sphere_matches_stokes(sim_dir):
    """Reference: bodies/test_ellipsoid_assphere_constforce.py — the
    ellipsoid machinery with equal axes must reproduce the sphere."""
    system = _run_body([0.5, 0.5, 0.5], force=(0.0, 0.0, 1.5))
    traj = TrajectoryReader("skelly_sim.out")
    traj.load_frame(0)
    z0, t0 = traj["bodies"][2][0]["position_"][2], traj["time"]
    traj.load_frame(-1)
    zf, tf = traj["bodies"][2][0]["position_"][2], traj["time"]
    pre = np.load("body_precompute.npz")
    R = float(np.mean(np.linalg.norm(pre["node_positions_ref"], axis=1)))
    v_theory = 1.5 / (6 * np.pi * 0.9 * R)
    v_measured = (zf - z0) / (tf - t0)
    rel = abs(1 - v_measured / v_theory)
    assert rel < 1e-4, f"v={v_measured} vs {v_theory} (rel {rel})"
