#!/usr/bin/env python3
"""Point force inside a spherical periphery: the confined stokeslet flow.

Counterpart of the reference's stokes_tests/ps_const_force_in_sphere — the
wall-bounded point-force field has a classical image solution, making this
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
                              force=[0.0, 0.0, 1.0])]
config.periphery = Periphery(n_nodes=4000, shape="sphere", radius=4.0,
                             precompute_file="periphery_precompute.npz")
config.save("skelly_config.toml")
print("wrote skelly_config.toml; run the precompute before simulating")
