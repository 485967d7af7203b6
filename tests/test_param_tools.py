"""Parametric sampling utilities: arc-length and surface-area uniformity."""

import numpy as np

from skellysim_tpu.utils import param_tools


def test_r_arc_uniform_spacing_on_circle():
    curve = lambda t: np.stack([np.cos(t), np.sin(t), 0 * t], axis=-1)
    pts, ts = param_tools.r_arc(50, curve, 0.0, np.pi, uniform_spacing=True)
    seg = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    assert seg.std() / seg.mean() < 1e-3
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.0, atol=1e-12)


def test_r_arc_random_uniform_density():
    # non-uniform parametrization: t^2 along a straight line; samples must
    # still be uniform in arc length (i.e. in x), not in t
    curve = lambda t: np.stack([t**2, 0 * t, 0 * t], axis=-1)
    rng = np.random.default_rng(0)
    pts, ts = param_tools.r_arc(20000, curve, 0.0, 1.0, rng=rng)
    x = pts[:, 0]
    hist, _ = np.histogram(x, bins=10, range=(0, 1))
    assert hist.std() / hist.mean() < 0.05


def test_r_surface_uniform_on_sphere():
    def sphere(t, u):  # t = azimuth, u = polar
        return np.stack([np.sin(u) * np.cos(t), np.sin(u) * np.sin(t),
                         np.cos(u)], axis=-1)

    rng = np.random.default_rng(1)
    pts, ts, us = param_tools.r_surface(30000, sphere, 0, 2 * np.pi, 0, np.pi,
                                        rng=rng)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.0, atol=1e-9)
    # uniform on the sphere → z uniformly distributed in [-1, 1]
    hist, _ = np.histogram(pts[:, 2], bins=10, range=(-1, 1))
    assert hist.std() / hist.mean() < 0.06


def test_arc_length_circle():
    curve = lambda t: np.stack([np.cos(t), np.sin(t), 0 * t], axis=-1)
    assert abs(param_tools.arc_length(curve, 0, 2 * np.pi) - 2 * np.pi) < 1e-4


def test_surface_area_sphere():
    def sphere(t, u):
        return np.stack([np.sin(u) * np.cos(t), np.sin(u) * np.sin(t),
                         np.cos(u)], axis=-1)
    got = param_tools.surface_area(sphere, 0, 2 * np.pi, 0, np.pi)
    assert abs(got - 4 * np.pi) / (4 * np.pi) < 1e-3


def test_r_arc_from_data_uniform():
    # tabulated quarter circle, non-uniform parameter spacing
    t = np.linspace(0, 1, 300) ** 2
    coords = np.stack([np.cos(t * np.pi / 2), np.sin(t * np.pi / 2),
                       0 * t], axis=1)
    pts, _ = param_tools.r_arc_from_data(40, coords, uniform_spacing=True)
    seg = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    assert seg.std() / seg.mean() < 2e-2
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.0, atol=1e-3)


def test_r_surface_from_data_uniform_density():
    t = np.linspace(0, 2 * np.pi, 120)
    u = np.linspace(0.3, np.pi - 0.3, 120)   # avoid polar degeneracies
    T, U = np.meshgrid(t, u, indexing="ij")
    coords = np.stack([np.sin(U) * np.cos(T), np.sin(U) * np.sin(T),
                       np.cos(U)], axis=-1)
    rng = np.random.default_rng(0)
    pts, ts, us = param_tools.r_surface_from_data(30000, coords, t, u, rng=rng)
    # uniform per unit area → z-histogram flat on a sphere band
    hist, _ = np.histogram(pts[:, 2], bins=8,
                           range=(np.cos(np.pi - 0.3), np.cos(0.3)))
    assert hist.std() / hist.mean() < 0.05
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.0, atol=2e-3)
