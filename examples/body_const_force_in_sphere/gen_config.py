#!/usr/bin/env python3
"""Rigid sphere dragged by a constant force inside a spherical periphery.

Counterpart of the reference's stokes_tests/body_const_force_in_sphere:
the confined mobility has the closed-form concentric-spheres correction,
so the trajectory is an analytic end-to-end gate (see
tests/test_e2e_body_fiber.py for the test-suite version).
"""

from skellysim_tpu.config import Body, Config, Periphery

config = Config()
config.params.eta = 1.0
config.params.dt_initial = 1e-2
config.params.dt_write = 1e-1
config.params.t_final = 1.0
config.params.gmres_tol = 1e-10
config.params.adaptive_timestep_flag = False
config.params.pair_evaluator = "direct"

config.bodies = [Body(shape="sphere", radius=0.5, n_nodes=600,
                      position=[0.0, 0.0, 0.0],
                      external_force=[0.0, 0.0, 1.0],
                      precompute_file="body_precompute.npz")]
config.periphery = Periphery(n_nodes=4000, shape="sphere", radius=4.0,
                             precompute_file="periphery_precompute.npz")
config.save("skelly_config.toml")
print("wrote skelly_config.toml; run the precompute before simulating")
