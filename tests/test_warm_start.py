"""GMRES warm start (params.gmres_warm_start, default on): starting the
Krylov iteration from the previous step's solution must not change the
physics — the exit criterion is the same relative residual — while reducing
(or at worst matching) the iteration count. The reference's Belos solve
always starts from x0 = 0 (solver_hydro.cpp:50-61); the warm start is a
framework optimization with an off switch for exact-iteration-count parity.
"""

import numpy as np

from skellysim_tpu.config import Config, Fiber, Params, perturbed_fiber_positions
from skellysim_tpu.system.system import System


def _run(warm_start: bool, n_steps: int = 4):
    rng = np.random.default_rng(5)
    fibers = []
    for i in range(6):
        base = np.array([np.cos(i), np.sin(i), 0.1 * i])
        x = perturbed_fiber_positions(0.02, 1.0, base, [0.0, 0.0, 1.0], 16,
                                      rng=rng)
        fibers.append(Fiber(n_nodes=16, length=1.0, bending_rigidity=0.01,
                            radius=0.0125, force_scale=-0.05,
                            x=x.ravel().tolist()))
    cfg = Config(params=Params(eta=1.0, dt_initial=5e-3, gmres_tol=1e-10,
                               gmres_warm_start=warm_start), fibers=fibers)
    system = System(cfg.to_dict())
    for _ in range(n_steps):
        err, conv = system.step()
        assert conv
    return np.concatenate([np.asarray(b.x).ravel()
                           for b in system.fibers.blocks])


def test_warm_start_trajectory_matches_cold():
    x_cold = _run(False)
    x_warm = _run(True)
    # both solves exit at ||b - Ax||/||b|| <= 1e-10; trajectories agree to
    # the solver tolerance class
    np.testing.assert_allclose(x_warm, x_cold, rtol=0, atol=5e-8)
