"""Chebyshev spectral toolbox.

JAX/numpy counterpart of the reference's experimental skelly_chebyshev
header (include/skelly_chebyshev.hpp): Chebyshev-T root points (ascending
order), Vandermonde synthesis/analysis matrices, coefficient-space derivative
and integration matrices, node↔coefficient toggles, function products, and
endpoint evaluation. Matrices are built host-side once and used as jnp
operands inside jitted spectral-fiber code.
"""

from __future__ import annotations

import functools

import numpy as np

REPR_COEFF = "c"
REPR_NODE = "n"


def chebyshev_ratio(lb: float, ub: float) -> float:
    return (ub - lb) / 2.0


def cheb_points(order: int, lb: float = -1.0, ub: float = 1.0) -> np.ndarray:
    """Chebyshev-T roots in ascending order, scaled to [lb, ub]
    (skelly_chebyshev.hpp:67-83)."""
    k = np.arange(order, 0, -1)
    theta = np.pi / 2.0 * (2.0 * k - 1.0) / order
    x = np.cos(theta)
    return (x + 1.0) * chebyshev_ratio(lb, ub) + lb


def cheb_basis(x: np.ndarray, order: int) -> np.ndarray:
    """T_j(x) for j < order, via the two-term recurrence. Shape (len(x), order)."""
    x = np.atleast_1d(np.asarray(x, float))
    A = np.zeros((len(x), order))
    A[:, 0] = 1.0
    if order > 1:
        A[:, 1] = x
        for j in range(2, order):
            A[:, j] = 2.0 * x * A[:, j - 1] - A[:, j - 2]
    return A


@functools.lru_cache(maxsize=None)
def vandermonde(order: int) -> np.ndarray:
    """V[i, j] = T_j(x_i) at the canonical points: coefficients → node values."""
    return cheb_basis(cheb_points(order), order)


@functools.lru_cache(maxsize=None)
def inverse_vandermonde(order: int) -> np.ndarray:
    return np.linalg.inv(vandermonde(order))


def derivative_coeffs(a: np.ndarray) -> np.ndarray:
    """Coefficients of d/dx Σ a_k T_k (length len(a) − 1).

    Standard recurrence b_{k-1} = b_{k+1} + 2k a_k, b_0 halved.
    """
    n = len(a)
    if n <= 1:
        return np.zeros(max(n - 1, 0))
    b = np.zeros(n + 1)
    for k in range(n - 1, 0, -1):
        b[k - 1] = b[k + 1] + 2 * k * a[k]
    b[0] *= 0.5
    return b[:n - 1]


@functools.lru_cache(maxsize=None)
def derivative_matrix(n: int, D: int = 1, in_repr: str = REPR_COEFF,
                      out_repr: str = REPR_COEFF, scale: float = 1.0) -> np.ndarray:
    """(n−D, n) spectral D-th derivative (skelly_chebyshev.hpp:216-228)."""
    M = np.zeros((n - D, n))
    for j in range(n):
        col = np.zeros(n)
        col[j] = 1.0
        d = col
        for _ in range(D):
            d = derivative_coeffs(d)
        M[:len(d), j] = d
    M = M * scale**D
    return _toggle(M, in_repr, out_repr)


@functools.lru_cache(maxsize=None)
def integration_matrix(order: int, in_repr: str = REPR_COEFF,
                       out_repr: str = REPR_COEFF, scale: float = 1.0) -> np.ndarray:
    """(order, order) antiderivative operator (skelly_chebyshev.hpp:231-240).

    Inverse of [D1; T(−1)] stacked: maps [f' coefficients; f(−1)] → f
    coefficients. The integrated-form fiber zeroes its first row and injects
    integration constants explicitly.
    """
    D1 = derivative_matrix(order, 1, scale=scale)
    bottom = cheb_basis(np.array([-1.0]), order)
    A = np.vstack([D1, bottom])
    return _toggle(np.linalg.inv(A), in_repr, out_repr)


def _toggle(M: np.ndarray, in_repr: str, out_repr: str) -> np.ndarray:
    """Adapt a coeff→coeff operator to other representations
    (skelly_chebyshev.hpp:135-152)."""
    out = M
    if in_repr == REPR_NODE:
        out = out @ inverse_vandermonde(M.shape[1])
    if out_repr == REPR_NODE:
        out = vandermonde(M.shape[0]) @ out
    return out


def to_nodes(coeffs):
    V = vandermonde(len(coeffs))
    return V @ coeffs


def to_coeffs(values):
    IV = inverse_vandermonde(len(values))
    return IV @ values


def resize_coeffs(a, n_out: int):
    """Truncate or zero-pad a coefficient vector (spectral projection)."""
    import jax.numpy as jnp

    n = a.shape[0]
    if n == n_out:
        return a
    if n > n_out:
        return a[:n_out]
    return jnp.concatenate([jnp.asarray(a), jnp.zeros(n_out - n)])


def multiply(a, b, n_out: int):
    """Coefficient-space product of two Chebyshev series, truncated to n_out.

    Evaluated by synthesis on a grid large enough to be alias-free for the
    product degree, pointwise multiply, then analysis.
    """
    import jax.numpy as jnp

    n = max(a.shape[0], b.shape[0])
    m = 2 * n  # alias-free for a product of two degree-(n−1) series
    Va = jnp.asarray(cheb_basis(cheb_points(m), a.shape[0]))
    Vb = jnp.asarray(cheb_basis(cheb_points(m), b.shape[0]))
    IV = jnp.asarray(inverse_vandermonde(m))
    prod = (Va @ a) * (Vb @ b)
    return (IV @ prod)[:n_out]


def eval_left(a):
    """f(−1) = Σ a_k (−1)^k."""
    import jax.numpy as jnp

    signs = jnp.asarray((-1.0) ** np.arange(a.shape[0]))
    return jnp.sum(a * signs)


def eval_right(a):
    """f(+1) = Σ a_k."""
    import jax.numpy as jnp

    return jnp.sum(a)
