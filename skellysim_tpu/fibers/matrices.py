"""Finite-difference discretization matrices for fibers.

Host-side numpy, computed once per node count and cached. These are the
static operators the batched (vmapped) fiber assembly consumes on device.

Behavioral parity targets in the reference:
  * Fornberg finite-difference weight matrices: src/core/utils.cpp:48-105
  * barycentric downsampling matrix:            src/core/utils.cpp:12-36
  * per-node-count matrix cache (D1..D4, P_X, P_T, weights, downsample):
    src/core/fiber_finite_difference.cpp:519-562

Layout convention here differs from the reference (which pre-transposes for
column-vector Eigen layout): all matrices here act on node-major arrays from
the left, i.e. ``xs = (2/L) * D1 @ x`` with ``x`` of shape ``(n_nodes, 3)``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

#: Node counts supported by the finite-difference fiber discretization.
#: Mirrors the reference's discrete resolution set
#: (src/core/fiber_finite_difference.cpp:522).
SUPPORTED_NODE_COUNTS = (8, 16, 24, 32, 48, 64, 96, 128)

#: Finite-difference order parameter (reference hard-codes 4,
#: src/core/fiber_finite_difference.cpp:562).
FD_ORDER = 4


def fornberg_weights(x: np.ndarray, x0: float, m: int) -> np.ndarray:
    """Weights of the m-th derivative at x0 from samples at points x.

    Classic algorithm from B. Fornberg, "Calculation of weights in finite
    difference formulas", SIAM Rev. 40(3), 1998. Returns c with
    f^(m)(x0) ≈ sum_k c[k] f(x[k]).
    """
    n = len(x)
    c = np.zeros((n, m + 1))
    c[0, 0] = 1.0
    c1 = 1.0
    c4 = x[0] - x0
    for i in range(1, n):
        mn = min(i, m)
        c2 = 1.0
        c5 = c4
        c4 = x[i] - x0
        for j in range(i):
            c3 = x[i] - x[j]
            c2 *= c3
            if j == i - 1:
                for k in range(mn, 0, -1):
                    c[i, k] = c1 * (k * c[i - 1, k - 1] - c5 * c[i - 1, k]) / c2
                c[i, 0] = -c1 * c5 * c[i - 1, 0] / c2
            for k in range(mn, 0, -1):
                c[j, k] = (c4 * c[j, k] - k * c[j, k - 1]) / c3
            c[j, 0] = c4 * c[j, 0] / c3
        c1 = c2
    return c[:, m]


def finite_diff_matrix(s: np.ndarray, deriv_order: int, n_support: int) -> np.ndarray:
    """Dense m-th derivative matrix on grid s using n_support-point stencils.

    Row i holds the Fornberg weights of the ``deriv_order``-th derivative at
    s[i], computed over a contiguous window of ``n_support`` grid points:
    centered in the interior, one-sided at the ends. Matches the stencil
    window selection of the reference's utils::finite_diff
    (src/core/utils.cpp:48-105) so the resulting operators agree to rounding.
    """
    n = len(s)
    if n_support > n:
        raise ValueError(f"support {n_support} exceeds grid size {n}")
    D = np.zeros((n, n))
    half = (n_support - 1) // 2
    width = n_support - 1  # reference decrements n_s and uses n_s+1 points
    for i in range(n):
        if i < half:
            lo, hi = 0, width + 1
        elif i > n - half - 2:
            lo, hi = n - width - 1, n
        else:
            lo, hi = i - half, i - half + width + 1
        D[i, lo:hi] = fornberg_weights(s[lo:hi], s[i], deriv_order)
    return D


def barycentric_resample_matrix(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Resampling matrix P with (P f)(y_j) ≈ f(y_j) from samples f(x_k).

    Barycentric interpolation (Berrut & Trefethen, SIAM Rev. 46(3), 2004)
    with the alternating-sign weight set the reference uses
    (src/core/utils.cpp:12-36): w_k = (-1)^k, halved at both ends.
    """
    N, M = len(x), len(y)
    w = np.ones(N)
    w[1::2] = -1.0
    w[0] = 0.5
    w[N - 1] = -0.5 * (-1.0) ** N
    P = np.zeros((M, N))
    for j in range(M):
        d = y[j] - x
        exact = np.abs(d) <= np.finfo(float).eps
        terms = np.where(exact, 0.0, w / np.where(exact, 1.0, d))
        with np.errstate(divide="ignore"):
            S = np.sum(w / d)  # reference normalizes by the un-guarded sum
        row = terms / S
        row[exact] = 1.0
        P[j] = row
    return P


@dataclass(frozen=True)
class FiberMatrices:
    """Static per-node-count operator set for the FD fiber discretization.

    All operators are for the canonical arclength coordinate alpha in [-1, 1];
    physical derivatives scale by (2/L)^k.
    """

    n_nodes: int
    alpha: np.ndarray          # (n,) uniform grid on [-1, 1]
    alpha_roots: np.ndarray    # (n-4,) interior collocation grid for X rows
    alpha_tension: np.ndarray  # (n-2,) interior collocation grid for T rows
    D1: np.ndarray             # (n, n) first-derivative matrix
    D2: np.ndarray
    D3: np.ndarray
    D4: np.ndarray
    P_X: np.ndarray            # (n-4, n) downsample for position equations
    P_T: np.ndarray            # (n-2, n) downsample for tension equation
    P_downsample_bc: np.ndarray  # (4n-14, 4n) block-diag downsample of [x;y;z;T]
    weights: np.ndarray        # (n,) trapezoid quadrature weights on alpha


@functools.lru_cache(maxsize=None)
def fiber_matrices(n_nodes: int, fd_order: int = FD_ORDER) -> FiberMatrices:
    """Build (and cache) the operator set for one node count.

    Mirrors compute_matrices_finitediff
    (src/core/fiber_finite_difference.cpp:519-562): derivative k uses a
    (fd_order + k)-point stencil; the boundary-condition downsample keeps
    n-4 interior rows per position component and n-2 for tension, freeing 14
    rows for the rectangular BC block.
    """
    n = n_nodes
    if n not in SUPPORTED_NODE_COUNTS:
        raise ValueError(f"n_nodes={n} not in supported set {SUPPORTED_NODE_COUNTS}")
    alpha = np.linspace(-1.0, 1.0, n)
    nr = n - 4
    alpha_roots = 2.0 * (0.5 + np.arange(nr)) / nr - 1.0
    nt = n - 2
    alpha_tension = 2.0 * (0.5 + np.arange(nt)) / nt - 1.0

    D1 = finite_diff_matrix(alpha, 1, fd_order + 1)
    D2 = finite_diff_matrix(alpha, 2, fd_order + 2)
    D3 = finite_diff_matrix(alpha, 3, fd_order + 3)
    D4 = finite_diff_matrix(alpha, 4, fd_order + 4)

    P_X = barycentric_resample_matrix(alpha, alpha_roots)
    P_T = barycentric_resample_matrix(alpha, alpha_tension)

    P = np.zeros((4 * n - 14, 4 * n))
    for c in range(3):
        P[c * nr:(c + 1) * nr, c * n:(c + 1) * n] = P_X
    P[3 * nr:3 * nr + nt, 3 * n:4 * n] = P_T

    w = np.full(n, 2.0)
    w[0] = w[-1] = 1.0
    w /= n - 1

    return FiberMatrices(
        n_nodes=n, alpha=alpha, alpha_roots=alpha_roots,
        alpha_tension=alpha_tension, D1=D1, D2=D2, D3=D3, D4=D4,
        P_X=P_X, P_T=P_T, P_downsample_bc=P, weights=w,
    )
