#!/usr/bin/env python3
"""Single free fiber under constant tangential force (analytic drag check)."""

import numpy as np

from skellysim_tpu.config import Config, Fiber

config = Config()
config.params.eta = 0.7
config.params.dt_initial = 1e-4
config.params.dt_min = 1e-4
config.params.dt_max = 1e-4
config.params.dt_write = 1e-3
config.params.t_final = 1e-2
config.params.gmres_tol = 1e-10
config.params.pair_evaluator = "direct"

length = 0.75
fib = Fiber(force_scale=0.31, length=length, n_nodes=8, bending_rigidity=0.0025)
fib.fill_node_positions(np.array([0.0, 0.0, 0.0]), np.array([0.0, 0.0, 1.0]))
config.fibers = [fib]
config.save("skelly_config.toml")
print("wrote skelly_config.toml")
