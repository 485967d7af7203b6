"""Unit tests for the fiber finite-difference operator set.

Mirrors the reference's unit_test_fiber_finite_difference coverage: derivative
matrices are exact on polynomials up to the stencil order, the barycentric
downsample reproduces smooth functions, and shapes match the discretization
contract (4n-14 downsampled rows)."""

import numpy as np
import pytest

from skellysim_tpu.fibers.matrices import (
    SUPPORTED_NODE_COUNTS,
    barycentric_resample_matrix,
    finite_diff_matrix,
    fiber_matrices,
    fornberg_weights,
)


def test_fornberg_weights_match_known_central_stencil():
    # classic 5-point central first/second derivative weights on unit grid
    x = np.array([-2.0, -1.0, 0.0, 1.0, 2.0])
    w1 = fornberg_weights(x, 0.0, 1)
    np.testing.assert_allclose(w1, [1 / 12, -2 / 3, 0, 2 / 3, -1 / 12], atol=1e-14)
    w2 = fornberg_weights(x, 0.0, 2)
    np.testing.assert_allclose(w2, [-1 / 12, 4 / 3, -5 / 2, 4 / 3, -1 / 12], atol=1e-13)


@pytest.mark.parametrize("n", [8, 32, 64])
@pytest.mark.parametrize("m", [1, 2, 3, 4])
def test_derivative_matrices_exact_on_polynomials(n, m):
    mats = fiber_matrices(n)
    D = [None, mats.D1, mats.D2, mats.D3, mats.D4][m]
    # stencil for derivative m uses 4+m points -> exact on degree 4+m-1 polys
    deg = 4 + m - 1
    coeffs = np.arange(1.0, deg + 2)
    f = np.polyval(coeffs, mats.alpha)
    want = np.polyval(np.polyder(coeffs, m), mats.alpha)
    got = D @ f
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-7)


def test_barycentric_downsample_reproduces_smooth_function():
    mats = fiber_matrices(32)
    f = np.sin(2.0 * mats.alpha) + mats.alpha**3
    got = mats.P_X @ f
    want = np.sin(2.0 * mats.alpha_roots) + mats.alpha_roots**3
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_barycentric_exact_at_coincident_point():
    x = np.linspace(-1, 1, 9)
    P = barycentric_resample_matrix(x, np.array([x[3]]))
    f = np.cos(x)
    np.testing.assert_allclose(P @ f, [np.cos(x[3])], atol=1e-12)


@pytest.mark.parametrize("n", SUPPORTED_NODE_COUNTS)
def test_shapes_and_quadrature(n):
    mats = fiber_matrices(n)
    assert mats.D1.shape == (n, n)
    assert mats.P_X.shape == (n - 4, n)
    assert mats.P_T.shape == (n - 2, n)
    assert mats.P_downsample_bc.shape == (4 * n - 14, 4 * n)
    # trapezoid weights integrate alpha-constant to 2 (length of [-1,1])
    np.testing.assert_allclose(mats.weights.sum(), 2.0, atol=1e-14)


def test_finite_diff_one_sided_at_ends():
    x = np.linspace(-1, 1, 16)
    D = finite_diff_matrix(x, 1, 5)
    # first row must only touch the first 5 points (one-sided stencil)
    assert np.all(D[0, 5:] == 0.0)
    assert np.all(D[-1, :-5] == 0.0)
