#!/usr/bin/env python3
"""Small driven-fiber run whose trajectory the listener example analyses."""

import numpy as np

from skellysim_tpu.config import Config, Fiber

config = Config()
config.params.eta = 1.0
config.params.dt_initial = 1e-2
config.params.dt_write = 5e-2
config.params.t_final = 0.5
config.params.gmres_tol = 1e-10
config.params.pair_evaluator = "direct"

fib = Fiber(force_scale=0.5, length=1.0, n_nodes=16, bending_rigidity=0.0025)
fib.fill_node_positions(np.array([0.0, 0.0, 0.0]), np.array([0.0, 0.0, 1.0]))
config.fibers = [fib]
config.save("skelly_config.toml")
print("wrote skelly_config.toml")
