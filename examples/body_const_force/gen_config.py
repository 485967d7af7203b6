#!/usr/bin/env python3
"""Rigid sphere under constant force (Stokes mobility check)."""

from skellysim_tpu.config import Body, Config

config = Config()
config.params.eta = 0.9
config.params.dt_initial = 0.1
config.params.dt_min = 1e-4
config.params.dt_max = 0.1
config.params.dt_write = 0.1
config.params.t_final = 1.0
config.params.gmres_tol = 1e-10
config.params.pair_evaluator = "direct"

config.bodies = [Body(
    shape="sphere", radius=0.5, n_nodes=800,
    position=[0.0, 0.0, 0.0], external_force=[0.0, 0.0, 1.5],
    precompute_file="body_precompute.npz",
)]
config.save("skelly_config.toml")
print("wrote skelly_config.toml; run the precompute before simulating")
