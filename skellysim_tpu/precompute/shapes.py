"""Surface node generation: Fibonacci lattices on spheres/ellipsoids,
surfaces of revolution.

Node layouts reproduce the reference's ShapeGallery lattices
(src/skelly_sim/shape_gallery.py:62-160) — the golden-ratio spherical
Fibonacci lattice with latitude arcsin(2i/(2N+1)) — so precompute data is
geometrically interchangeable. Normals come from the analytic level-set
gradient of each shape.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

GOLDEN = (1.0 + np.sqrt(5.0)) / 2.0


@dataclass
class Surface:
    nodes: np.ndarray          # (N, 3)
    normals: np.ndarray        # (N, 3) outward unit normals
    h: Optional[Callable] = None       # level-set h(p) == 0 on the surface
    gradh: Optional[Callable] = None   # its gradient
    weights: Optional[np.ndarray] = None  # (N,) quadrature weights when the
                                          # mesh structure provides them


def fibonacci_sphere_directions(n_nodes: int) -> np.ndarray:
    """Unit vectors of the spherical Fibonacci lattice (shape_gallery.py:69-85)."""
    N = n_nodes // 2
    i = np.arange(-N, N, dtype=np.float64)
    lat = np.arcsin((2.0 * i) / (2 * N + 1))
    lon = np.mod(i, GOLDEN) * 2 * np.pi / GOLDEN
    lon = np.where(lon < -np.pi, 2 * np.pi + lon, lon)
    lon = np.where(lon > np.pi, lon - 2 * np.pi, lon)
    return np.stack([np.cos(lon) * np.cos(lat), np.sin(lon) * np.cos(lat), np.sin(lat)],
                    axis=1)


def sphere(n_nodes: int, radius: float) -> Surface:
    u = fibonacci_sphere_directions(n_nodes)
    nodes = radius * u

    def h(p):
        return np.sum(p * p, axis=1) - radius * radius

    def gradh(p):
        return 2.0 * p

    return Surface(nodes=nodes, normals=u.copy(), h=h, gradh=gradh)


def ellipsoid(n_nodes: int, a: float, b: float, c: float) -> Surface:
    u = fibonacci_sphere_directions(n_nodes)
    nodes = u * np.array([a, b, c])

    def h(p):
        return (p[:, 0] / a) ** 2 + (p[:, 1] / b) ** 2 + (p[:, 2] / c) ** 2 - 1.0

    def gradh(p):
        return 2.0 * p / np.array([a, b, c]) ** 2

    normals = gradh(nodes)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    return Surface(nodes=nodes, normals=normals, h=h, gradh=gradh)


def surface_of_revolution(height_func: Callable[[np.ndarray], np.ndarray],
                          lower: float, upper: float,
                          target_nodes: int = 6000,
                          scale_factor: float = 1.0) -> Surface:
    """Axisymmetric surface x ∈ [lower, upper], radius h(x) about the x-axis.

    Nodes on near-uniform rings sized so azimuthal and axial spacings match,
    which keeps the point distribution quasi-uniform for quadrature.
    """
    # estimate arclength of the generator curve
    xs = np.linspace(lower, upper, 4001)
    eps = (upper - lower) * 1e-7
    hx = height_func(np.clip(xs, lower + eps, upper - eps))
    arel = np.concatenate([[0.0], np.cumsum(np.hypot(np.diff(xs), np.diff(hx)))])
    total_len = arel[-1]
    mean_r = np.trapezoid(hx, xs) / (upper - lower)
    # choose ring count so that n_rings * mean_ring_nodes ≈ target
    n_rings = max(8, int(np.sqrt(target_nodes * total_len / (2 * np.pi * mean_r))))
    s_targets = (np.arange(n_rings) + 0.5) / n_rings * total_len
    ring_x = np.interp(s_targets, arel, xs)

    nodes, normals, weights = [], [], []
    dx = (upper - lower) * 1e-6
    ds_ring = total_len / n_rings  # arclength band per ring (midpoint rule)
    for k, rx in enumerate(ring_x):
        r = float(height_func(np.array([np.clip(rx, lower + eps, upper - eps)]))[0])
        if r <= 0:
            continue
        n_phi = max(6, int(round(2 * np.pi * r / ds_ring)))
        phi = 2 * np.pi * (np.arange(n_phi) + 0.5 * (k % 2)) / n_phi
        xq = np.clip([rx - dx, rx + dx], lower + eps, upper - eps)
        drdx = (height_func(np.array([xq[1]]))[0] - height_func(np.array([xq[0]]))[0]) / (xq[1] - xq[0])
        # product midpoint rule: band arclength × azimuthal arc per node
        w = ds_ring * (2 * np.pi * r / n_phi)
        for p in phi:
            cy, sy = np.cos(p), np.sin(p)
            nodes.append([rx, r * cy, r * sy])
            nrm = np.array([-drdx, cy, sy])
            normals.append(nrm / np.linalg.norm(nrm))
            weights.append(w)
    nodes = np.asarray(nodes) * scale_factor
    normals = np.asarray(normals)
    weights = np.asarray(weights) * scale_factor**2
    return Surface(nodes=nodes, normals=normals, weights=weights)
