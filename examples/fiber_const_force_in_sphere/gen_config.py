#!/usr/bin/env python3
"""Fiber under constant force confined by a spherical periphery."""

import numpy as np

from skellysim_tpu.config import Config, Fiber, Periphery

config = Config()
config.params.eta = 1.0
config.params.dt_initial = 1e-2
config.params.dt_write = 1e-1
config.params.t_final = 1.0
config.params.gmres_tol = 1e-10
config.params.adaptive_timestep_flag = False
config.params.pair_evaluator = "direct"

length = 0.75
fib = Fiber(force_scale=0.31, length=length, n_nodes=8, bending_rigidity=0.0025)
fib.fill_node_positions(np.array([1.0, 0.0, 0.0]), np.array([0.0, 0.0, 1.0]))
config.fibers = [fib]
config.periphery = Periphery(n_nodes=4000, shape="sphere", radius=4.0,
                             precompute_file="periphery_precompute.npz")
config.save("skelly_config.toml")
print("wrote skelly_config.toml; run the precompute before simulating")
