#!/usr/bin/env python3
"""Clamped buckling fiber whose trajectory the listener example analyses.

A clamped fiber driven past the buckling threshold bends, and its elastic
forces radiate a rich flow field — the interesting case for streamline /
velocity-field analysis. (A FREE straight motor-driven fiber would show
near-zero analysis flow: motor forcing is internal and deliberately not
radiated — see tests/test_e2e_more_physics.py.)
"""

import numpy as np

from skellysim_tpu.config import Config, Fiber, perturbed_fiber_positions

config = Config()
config.params.eta = 1.0
config.params.dt_initial = 1e-2
config.params.dt_write = 5e-2
config.params.t_final = 0.5
config.params.gmres_tol = 1e-10
config.params.pair_evaluator = "direct"

sigma = 80.0  # dimensionless motor load, above the buckling threshold ~76
E = 0.0025
L = 1.0
fib = Fiber(force_scale=-sigma * E / L**2, length=L, n_nodes=32,
            bending_rigidity=E, minus_clamped=True)
x = perturbed_fiber_positions(0.01, L, np.zeros(3), [0.0, 0.0, 1.0], 32,
                              rng=np.random.default_rng(1))
fib.x = x.ravel().tolist()
config.fibers = [fib]
config.save("skelly_config.toml")
print("wrote skelly_config.toml")
