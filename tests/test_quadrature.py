"""Quadrature accuracy against closed-form surface integrals.

These bound the precompute pipeline's accuracy: body mobility tests need
~1e-6-class quadrature (the reference reaches this with RBF quadrature;
ours via spherical-harmonic moment fitting)."""

import numpy as np
import pytest

from skellysim_tpu.precompute import quadrature, shapes


def test_sphere_weights_sum_to_area():
    surf = shapes.sphere(800, 2.0)
    w = quadrature.sphere_weights(surf.nodes, 2.0)
    np.testing.assert_allclose(w.sum(), 4 * np.pi * 4.0, rtol=1e-10)
    assert np.all(w > 0)


@pytest.mark.parametrize("n", [400, 800])
def test_sphere_weights_integrate_smooth_function(n):
    R = 1.5
    surf = shapes.sphere(n, R)
    w = quadrature.sphere_weights(surf.nodes, R)
    # ∫ exp(z/R) dS over sphere radius R = 4π R² sinh(1)/1
    f = np.exp(surf.nodes[:, 2] / R)
    want = 4 * np.pi * R * R * np.sinh(1.0)
    got = float(w @ f)
    assert abs(1 - got / want) < 1e-8


def test_sphere_weights_integrate_harmonics_exactly():
    surf = shapes.sphere(600, 1.0)
    w = quadrature.sphere_weights(surf.nodes, 1.0)
    # any low-degree harmonic (l>0) integrates to ~0
    x, y, z = surf.nodes.T
    for f in [x, y, z, x * y, 3 * z**2 - 1, x * y * z]:
        assert abs(w @ f) < 1e-10


def test_ellipsoid_weights_area():
    a, b, c = 2.0, 1.5, 1.0
    surf = shapes.ellipsoid(1000, a, b, c)
    w = quadrature.ellipsoid_weights(surf.nodes, a, b, c)
    # Thomsen's approximation for ellipsoid surface area (error < 1.1%),
    # only used as sanity band; the integration test below is the sharp one
    p = 1.6075
    approx = 4 * np.pi * ((a**p * b**p + a**p * c**p + b**p * c**p) / 3) ** (1 / p)
    assert abs(1 - w.sum() / approx) < 0.011


def test_ellipsoid_weights_integrate_coordinate_moments():
    # ∫ x² dS on an ellipsoid has no elementary closed form, but odd moments
    # vanish exactly and the z->-z symmetric lattice must reproduce that
    a, b, c = 1.5, 1.2, 0.9
    surf = shapes.ellipsoid(800, a, b, c)
    w = quadrature.ellipsoid_weights(surf.nodes, a, b, c)
    x, y, z = surf.nodes.T
    for f in [x, y, z, x * y]:
        assert abs(w @ f) / w.sum() < 1e-9


def test_sphere_vs_ellipsoid_consistency():
    # a=b=c ellipsoid must reproduce sphere weights
    surf = shapes.sphere(500, 1.3)
    w_s = quadrature.sphere_weights(surf.nodes, 1.3)
    w_e = quadrature.ellipsoid_weights(surf.nodes, 1.3, 1.3, 1.3)
    np.testing.assert_allclose(w_s, w_e, rtol=1e-9)


def test_revolution_surface_weights_cylinderish():
    # surface of revolution with constant height = open cylinder; integral of
    # 1 over the lateral surface ≈ 2π r L (midpoint product rule)
    r0, L = 1.0, 4.0
    surf = shapes.surface_of_revolution(lambda x: np.full_like(x, r0), 0.0, L,
                                        target_nodes=2000)
    w = quadrature.triangulated_weights(surf.nodes)
    got = w.sum()
    want = 2 * np.pi * r0 * L
    # hull-based lumped weights close the ends; allow the cap area
    assert got == pytest.approx(want + 2 * np.pi * r0**2, rel=0.05)
