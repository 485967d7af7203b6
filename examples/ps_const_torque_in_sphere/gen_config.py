#!/usr/bin/env python3
"""point torque inside a spherical periphery: the confined rotlet flow.

Counterpart of the reference's stokes_tests/ps_const_torque_in_sphere — the
wall-bounded point-torque (rotlet) field decays as 1/r² and must vanish at the wall, making this
the point-source analogue of the fiber/body confinement checks.
"""

from skellysim_tpu.config import Config, Periphery, Point

config = Config()
config.params.eta = 1.0
config.params.dt_initial = 1e-2
config.params.dt_write = 1e-1
config.params.t_final = 1.0
config.params.gmres_tol = 1e-10
config.params.adaptive_timestep_flag = False
config.params.pair_evaluator = "direct"

config.point_sources = [Point(position=[0.0, 0.0, 1.0],
                              torque=[0.0, 0.0, 1.0])]
config.periphery = Periphery(n_nodes=4000, shape="sphere", radius=4.0,
                             precompute_file="periphery_precompute.npz")
config.save("skelly_config.toml")
print("wrote skelly_config.toml; run the precompute before simulating")
