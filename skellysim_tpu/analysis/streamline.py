"""Streamlines and vortex lines of the solved flow field.

Counterpart of the reference's Boost-odeint streamline tracer
(src/core/streamline.cpp): adaptive Cash-Karp RK45 integration of
dx/dt = u(x) (streamlines) or dx/dt = ω(x) (vortex lines, with vorticity from
a 6-point central-difference stencil of the velocity field), forward and
optionally backward in time, bailing out near singularities (‖u‖ > 1e3).

The integrator is a small host-side loop; every velocity evaluation is the
system's jitted velocity_at_targets, and the vorticity stencil evaluates its
six probe points in one batched call.
"""

from __future__ import annotations

from typing import Callable, List

import numpy as np

# Cash–Karp RK45 tableau
_CK_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [3 / 10, -9 / 10, 6 / 5],
    [-11 / 54, 5 / 2, -70 / 27, 35 / 27],
    [1631 / 55296, 175 / 512, 575 / 13824, 44275 / 110592, 253 / 4096],
]
_CK_B5 = np.array([37 / 378, 0, 250 / 621, 125 / 594, 0, 512 / 1771])
_CK_B4 = np.array([2825 / 27648, 0, 18575 / 48384, 13525 / 55296, 277 / 14336, 1 / 4])
_CK_C = np.array([0, 1 / 5, 3 / 10, 3 / 5, 1, 7 / 8])

SINGULARITY_SPEED = 1e3  # bailout threshold (streamline.cpp:51-53)


def integrate_adaptive(field: Callable[[np.ndarray], np.ndarray], x0: np.ndarray,
                       dt_init: float, t_final: float, abs_err: float,
                       rel_err: float):
    """Adaptive RK45 from 0 → t_final; returns (points, times) at step ends."""
    x = np.asarray(x0, float).copy()
    t, dt = 0.0, abs(dt_init) * np.sign(t_final or 1.0)
    points, times = [x.copy()], [0.0]
    direction = np.sign(t_final) if t_final != 0 else 1.0
    max_steps = 100000
    for _ in range(max_steps):
        if direction * (t - t_final) >= 0:
            break
        if direction * (t + dt - t_final) > 0:
            dt = t_final - t
        k = np.zeros((6, 3))
        for i in range(6):
            xi = x + dt * sum(a * k[j] for j, a in enumerate(_CK_A[i]))
            k[i] = field(xi)
        x5 = x + dt * (_CK_B5 @ k)
        x4 = x + dt * (_CK_B4 @ k)
        err = np.linalg.norm(x5 - x4)
        scale = abs_err + rel_err * max(np.linalg.norm(x), np.linalg.norm(x5))
        if err <= scale or abs(dt) < 1e-12:
            t += dt
            x = x5
            points.append(x.copy())
            times.append(t)
            if np.linalg.norm(field(x)) > SINGULARITY_SPEED:
                break
            if err > 0:
                dt *= min(2.0, 0.9 * (scale / err) ** 0.2)
        else:
            dt *= max(0.2, 0.9 * (scale / err) ** 0.25)
    return np.asarray(points), np.asarray(times)


def _join_back_forward(back_pts, back_t, fwd_pts, fwd_t):
    """Reverse the backward leg and join at the (shared) seed."""
    pts = np.concatenate([back_pts[::-1][:-1], fwd_pts], axis=0)
    t = np.concatenate([back_t[::-1][:-1], fwd_t])
    return pts, t


def trace_line(field, x0, dt_init=0.1, t_final=1.0, abs_err=1e-10, rel_err=1e-6,
               back_integrate=True):
    """One stream/vortex line; returns dict {x (n,3), val (n,3), time (n,)}."""
    fwd_pts, fwd_t = integrate_adaptive(field, x0, dt_init, t_final, abs_err, rel_err)
    if back_integrate:
        back_pts, back_t = integrate_adaptive(
            lambda x: -field(x), x0, dt_init, t_final, abs_err, rel_err)
        pts, t = _join_back_forward(back_pts, -back_t, fwd_pts, fwd_t)
    else:
        pts, t = fwd_pts, fwd_t
    vals = np.stack([field(p) for p in pts])
    return {"x": pts, "val": vals, "time": t}


def velocity_field_fn(system) -> Callable[[np.ndarray], np.ndarray]:
    def u(x):
        return system.velocity_at_targets(np.asarray(x, float)[None, :])[0]

    return u


def vorticity_field_fn(system, epsilon: float = 1e-7) -> Callable[[np.ndarray], np.ndarray]:
    """ω(x) via 6-point central differences of u (streamline.cpp:16-35)."""

    def w(x):
        probes = np.tile(np.asarray(x, float), (6, 1))
        for i in range(3):
            probes[2 * i, i] += epsilon
            probes[2 * i + 1, i] -= epsilon
        v = system.velocity_at_targets(probes)
        return 0.5 * np.array([
            (v[2, 2] - v[3, 2]) - (v[4, 1] - v[5, 1]),
            (v[4, 0] - v[5, 0]) - (v[0, 2] - v[1, 2]),
            (v[0, 1] - v[1, 1]) - (v[2, 0] - v[3, 0]),
        ]) / epsilon

    return w


def streamlines(system, seeds: np.ndarray, **kw) -> List[dict]:
    u = velocity_field_fn(system)
    return [trace_line(u, s, **kw) for s in np.atleast_2d(seeds)]


def vortexlines(system, seeds: np.ndarray, **kw) -> List[dict]:
    w = vorticity_field_fn(system)
    return [trace_line(w, s, **kw) for s in np.atleast_2d(seeds)]
