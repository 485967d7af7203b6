"""Uniform sampling of parametric curves and surfaces.

Counterpart of the reference's param_tools (src/skelly_sim/param_tools.py):
draw points uniformly by arc length on a parametric curve r(t), or uniformly
by surface area on a parametric surface r(t, u), for arbitrary user
functions. Used for fiber/site placement on analytic geometries; the config
helpers build on the same machinery.

Implementation: tabulate the metric (|r'| or the area element |r_t × r_u|)
on a fine grid, build cumulative distributions, and invert them — no
iterative solves, vectorized end to end.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np


def r_arc(n: int, curve: Callable[[np.ndarray], np.ndarray], t0: float, t1: float,
          rng: Optional[np.random.Generator] = None, grid: int = 4096,
          uniform_spacing: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """Sample points on curve(t) ∈ R^d uniform in arc length over [t0, t1].

    Returns (points (n, d), t values (n,)). ``uniform_spacing`` places them
    equally spaced in arc length instead of randomly.
    """
    t = np.linspace(t0, t1, grid)
    pts = np.asarray(curve(t))
    if pts.shape[0] != grid:
        pts = pts.T
    seg = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    s = np.concatenate([[0.0], np.cumsum(seg)])
    if uniform_spacing:
        targets = np.linspace(0.0, s[-1], n)
    else:
        rng = rng or np.random.default_rng()
        targets = rng.uniform(0.0, s[-1], n)
    ts = np.interp(targets, s, t)
    out = np.asarray(curve(ts))
    if out.shape[0] != n:
        out = out.T
    return out, ts


def r_surface(n: int, surface: Callable[[np.ndarray, np.ndarray], np.ndarray],
              t0: float, t1: float, u0: float, u1: float,
              rng: Optional[np.random.Generator] = None,
              grid: int = 512) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sample points on surface(t, u) ∈ R³ uniform in surface area.

    ``surface`` maps same-shaped arrays (t, u) to points with shape
    (..., 3). Returns (points (n, 3), t (n,), u (n,)).
    """
    rng = rng or np.random.default_rng()
    t = np.linspace(t0, t1, grid)
    u = np.linspace(u0, u1, grid)
    T, U = np.meshgrid(t, u, indexing="ij")
    P = np.asarray(surface(T, U))            # (grid, grid, 3)
    dt = t[1] - t[0]
    du = u[1] - u[0]
    rt = np.gradient(P, dt, axis=0)
    ru = np.gradient(P, du, axis=1)
    dA = np.linalg.norm(np.cross(rt, ru), axis=-1)  # (grid, grid)

    # marginal CDF in t, conditional CDF in u
    row_mass = dA.sum(axis=1)
    cdf_t = np.cumsum(row_mass)
    cdf_t = cdf_t / cdf_t[-1]
    ti_idx = np.searchsorted(cdf_t, rng.uniform(size=n))
    ti_idx = np.clip(ti_idx, 0, grid - 1)
    cdf_u = np.cumsum(dA, axis=1)
    cdf_u = cdf_u / cdf_u[:, -1:]
    uu = rng.uniform(size=n)
    uj_idx = np.array([np.searchsorted(cdf_u[i], x) for i, x in zip(ti_idx, uu)])
    uj_idx = np.clip(uj_idx, 0, grid - 1)

    ts = t[ti_idx] + rng.uniform(-0.5, 0.5, n) * dt
    us = u[uj_idx] + rng.uniform(-0.5, 0.5, n) * du
    ts = np.clip(ts, t0, t1)
    us = np.clip(us, u0, u1)
    pts = np.asarray(surface(ts, us))
    if pts.shape[0] != n:
        pts = pts.T
    return pts, ts, us
