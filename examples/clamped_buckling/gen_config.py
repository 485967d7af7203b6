#!/usr/bin/env python3
"""Clamped fiber under compressive motor force: buckling bifurcation.

sigma = |force_scale| L^3 / E. Below ~76 transverse kicks decay; above, they
grow into sustained oscillation (compare sigma = 72 vs 80).
"""

import sys

import numpy as np

from skellysim_tpu.config import Config, Fiber, Point

sigma = float(sys.argv[1]) if len(sys.argv) > 1 else 80.0

config = Config()
config.params.eta = 1.0
config.params.dt_initial = 0.02
config.params.dt_min = 0.01
config.params.dt_max = 0.1
config.params.dt_write = 0.1
config.params.t_final = 50.0
config.params.gmres_tol = 1e-10
config.params.pair_evaluator = "direct"

length, E, n = 1.0, 0.0025, 32
fib = Fiber(force_scale=-sigma * E / length**3, length=length, n_nodes=n,
            bending_rigidity=E, minus_clamped=True)
fib.x = np.linspace([0, 0, 0], [0, 0, length], n).ravel().tolist()
config.fibers = [fib]
config.point_sources = [Point(position=[0.0, 0.0, 10 * length],
                              force=[10.0, 0.0, 0.0], time_to_live=1.0)]
config.save("skelly_config.toml")
print(f"wrote skelly_config.toml (sigma={sigma})")
