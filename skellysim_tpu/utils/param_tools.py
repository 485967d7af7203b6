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


def arc_length(curve: Callable[[np.ndarray], np.ndarray], t0: float, t1: float,
               grid: int = 4096) -> float:
    """Total arc length of curve(t) over [t0, t1] (polyline quadrature)."""
    t = np.linspace(t0, t1, grid)
    pts = np.asarray(curve(t))
    if pts.shape[0] != grid:
        pts = pts.T
    return float(np.linalg.norm(np.diff(pts, axis=0), axis=1).sum())


def surface_area(surface: Callable[[np.ndarray, np.ndarray], np.ndarray],
                 t0: float, t1: float, u0: float, u1: float,
                 grid: int = 512) -> float:
    """Total area of surface(t, u) over the parameter rectangle."""
    t = np.linspace(t0, t1, grid)
    u = np.linspace(u0, u1, grid)
    T, U = np.meshgrid(t, u, indexing="ij")
    P = np.asarray(surface(T, U))
    rt = np.gradient(P, t[1] - t[0], axis=0)
    ru = np.gradient(P, u[1] - u[0], axis=1)
    dA = np.linalg.norm(np.cross(rt, ru), axis=-1)
    return float(np.trapezoid(np.trapezoid(dA, u, axis=1), t))


def r_arc_from_data(n: int, coords: np.ndarray, t: Optional[np.ndarray] = None,
                    rng: Optional[np.random.Generator] = None,
                    uniform_spacing: bool = False
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Arc-length-uniform samples from a TABULATED curve.

    ``coords`` is (m, d) points along the curve (the data analogue of
    ``r_arc``; reference param_tools.py r_arc_from_data). Points interpolate
    linearly along the polyline. Returns (points (n, d), parameter values).
    """
    coords = np.asarray(coords, float)
    m = coords.shape[0]
    t = np.linspace(0.0, 1.0, m) if t is None else np.asarray(t, float)
    seg = np.linalg.norm(np.diff(coords, axis=0), axis=1)
    s = np.concatenate([[0.0], np.cumsum(seg)])
    if uniform_spacing:
        targets = np.linspace(0.0, s[-1], n)
    else:
        rng = rng or np.random.default_rng()
        targets = rng.uniform(0.0, s[-1], n)
    ts = np.interp(targets, s, t)
    pts = np.stack([np.interp(targets, s, coords[:, k])
                    for k in range(coords.shape[1])], axis=1)
    return pts, ts


def r_surface_from_data(n: int, coords: np.ndarray,
                        t: Optional[np.ndarray] = None,
                        u: Optional[np.ndarray] = None,
                        rng: Optional[np.random.Generator] = None
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Area-uniform samples from a TABULATED surface grid.

    ``coords`` is (mt, mu, 3): surface points on a structured parameter
    grid (the data analogue of ``r_surface``). Cells are weighted by their
    parallelogram area; samples place bilinearly within a chosen cell.
    Returns (points (n, 3), t (n,), u (n,)).
    """
    rng = rng or np.random.default_rng()
    coords = np.asarray(coords, float)
    mt, mu = coords.shape[:2]
    t = np.linspace(0.0, 1.0, mt) if t is None else np.asarray(t, float)
    u = np.linspace(0.0, 1.0, mu) if u is None else np.asarray(u, float)
    et = coords[1:, :-1] - coords[:-1, :-1]      # (mt-1, mu-1, 3)
    eu = coords[:-1, 1:] - coords[:-1, :-1]
    area = np.linalg.norm(np.cross(et, eu), axis=-1).ravel()
    cdf = np.cumsum(area)
    cells = np.searchsorted(cdf, rng.uniform(0.0, cdf[-1], n))
    ci, cj = np.unravel_index(np.clip(cells, 0, area.size - 1),
                              (mt - 1, mu - 1))
    a = rng.uniform(size=n)
    b = rng.uniform(size=n)
    p00 = coords[ci, cj]
    pts = (p00 + a[:, None] * (coords[ci + 1, cj] - p00)
           + b[:, None] * (coords[ci, cj + 1] - p00)
           + (a * b)[:, None] * (coords[ci + 1, cj + 1] - coords[ci, cj + 1]
                                 - coords[ci + 1, cj] + p00))
    ts = t[ci] + a * (t[np.minimum(ci + 1, mt - 1)] - t[ci])
    us = u[cj] + b * (u[np.minimum(cj + 1, mu - 1)] - u[cj])
    return pts, ts, us
