"""Standalone time loop for ``fiber_type = "SpectralPenalty"``.

The reference's Chebyshev penalty fiber is experimental and OFFLINE-only:
`FiberChebyshevPenaltyAutodiff` (fiber_chebyshev_penalty_autodiff.hpp) is
compiled only by unit tests and benchmark harnesses — `System::init`
dispatches exclusively on FiberContainerBase::FIBERTYPE::FiniteDifference
(reference system.cpp:109-110,657). This driver EXCEEDS that parity: the
spectral fiber is runnable through the same CLI/config/trajectory pipeline
as everything else:

    [params]
    fiber_type = "SpectralPenalty"
    dt_initial = 2e-3
    t_final = 0.05

    [[fibers]]
    n_nodes = 16           # Chebyshev order (state per axis)
    length = 1.0
    bending_rigidity = 0.05
    curvature = [0.4, -0.2, 0.1]   # optional: seed Yssss coefficients

Physics per fiber (no inter-object hydrodynamics — the regime the
reference's header targets): 2D integrated-form Euler–Bernoulli elastica
with penalty tension and local SBT-style mobility, backward-Euler in time,
Newton via jacfwd (fibers/spectral_fiber.py, validated against the
reference's Julia golden data). Trajectories carry the sampled node
positions in the standard wire format (plane embedded at z = 0), so every
reader/exporter — TrajectoryReader, ParaView sources, Blender — consumes
spectral runs unchanged.
"""

from __future__ import annotations

import logging
from typing import List

import jax.numpy as jnp
import numpy as np

from skellysim_tpu.fibers.spectral_fiber import SpectralPenaltyFiber
from skellysim_tpu.io import trajectory as tio

logger = logging.getLogger("skellysim_tpu")


class SpectralSystem:
    """Minimal driver: a list of uncoupled spectral penalty fibers."""

    def __init__(self, config: dict, output_file: str = "skelly_sim.out"):
        p = config.get("params", {})
        assert p.get("fiber_type") == "SpectralPenalty"
        self.dt = float(p.get("dt_initial", 1e-3))
        self.t_final = float(p.get("t_final", 1.0))
        self.dt_write = float(p.get("dt_write", self.dt))
        self.newton_tol = float(p.get("gmres_tol", 1e-10))
        self.time = 0.0
        self._output_file = output_file
        self._writer = None

        self.fibers: List[SpectralPenaltyFiber] = []
        self.states: List[jnp.ndarray] = []
        self.lengths: List[float] = []
        self.E: List[float] = []
        self.n_sample = int(p.get("spectral_samples", 32))
        for t in config.get("fibers", []):
            n = int(t.get("n_nodes", 16))
            nt = int(t.get("n_nodes_tension", n))
            fib = SpectralPenaltyFiber(n, nt)
            L = float(t.get("length", 1.0))
            XX = np.asarray(fib.initial_straight(L)).copy()
            curv = t.get("curvature")
            if curv:
                ne = fib.n_equations
                k = min(len(curv), ne)
                # seed the Y fourth-derivative coefficients (a planar bend)
                XX[n:n + k] = np.asarray(curv[:k], float)
            self.fibers.append(fib)
            self.states.append(jnp.asarray(XX))
            self.lengths.append(L)
            self.E.append(float(t.get("bending_rigidity", 2.5e-3)))
        if not self.fibers:
            raise ValueError("fiber_type=SpectralPenalty needs [[fibers]]")

    # ---- stepping ----
    def step(self):
        max_res = 0.0
        for i, fib in enumerate(self.fibers):
            XX, res = fib.solve_timestep(self.states[i], self.lengths[i],
                                         self.E[i], self.dt,
                                         tol=self.newton_tol)
            self.states[i] = XX
            max_res = max(max_res, res)
        self.time += self.dt
        return max_res

    def extensibility_error(self) -> float:
        return max(float(f.extensibility_error(s, L)) for f, s, L in
                   zip(self.fibers, self.states, self.lengths))

    # ---- I/O (standard wire format; z = 0 plane embedding) ----
    def _frame(self) -> dict:
        fibs = []
        for fib, XX, L, E in zip(self.fibers, self.states, self.lengths,
                                 self.E):
            xy = np.asarray(fib.positions(XX, L, self.n_sample))
            x3 = np.concatenate([xy, np.zeros((xy.shape[0], 1))], axis=1)
            fibs.append(tio.pack_fiber(
                n_nodes=x3.shape[0], radius=0.0125, length=L, length_prev=L,
                bending_rigidity=E, penalty_param=500.0, force_scale=0.0,
                beta_tstep=1.0, binding_site=(-1, -1),
                tension=np.zeros(x3.shape[0]), x=x3, minus_clamped=False))
        return tio.pack_frame(self.time, self.dt, [], fibs, [], [],
                              np.zeros(0))

    def write_frame(self):
        if self._writer is None:
            self._writer = tio.TrajectoryWriter(self._output_file)
        self._writer.write_frame(self._frame())

    def run(self):
        self.write_frame()
        next_write = self.dt_write
        while self.time < self.t_final - 1e-15:
            res = self.step()
            logger.info("spectral time %.6g, dt %.6g, newton resid %.3e, "
                        "ext err %.3e", self.time, self.dt, res,
                        self.extensibility_error())
            if self.time + 1e-15 >= next_write:
                self.write_frame()
                next_write += self.dt_write
        if self._writer is not None:
            self._writer.close()
