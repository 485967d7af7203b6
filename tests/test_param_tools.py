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
