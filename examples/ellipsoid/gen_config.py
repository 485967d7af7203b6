#!/usr/bin/env python3
"""Ellipsoidal periphery with many clamped cortical fibers.

Scaled-down sibling of the reference's examples/ellipsoid (2000 fibers on an
8000-node surface); adjust N_FIBERS / n_nodes for full scale. Use
params.precision = "single" + pair_evaluator = "pallas" on TPU.
"""

from skellysim_tpu.config import Config, Fiber, Periphery

N_FIBERS = 200

config = Config()
config.params.eta = 1.0
config.params.dt_initial = 1e-2
config.params.dt_max = 1e-2
config.params.dt_write = 0.1
config.params.t_final = 5.0
config.params.gmres_tol = 1e-8
config.params.pair_evaluator = "direct"

config.periphery = Periphery(shape="ellipsoid", n_nodes=4000,
                             a=7.8, b=4.16, c=4.16,
                             precompute_file="periphery_precompute.npz")

config.fibers = [Fiber(length=1.0, bending_rigidity=2.5e-3, force_scale=-0.05,
                       minus_clamped=True, n_nodes=32) for _ in range(N_FIBERS)]
config.periphery.move_fibers_to_surface(config.fibers, ds_min=0.1, seed=100)
config.save("skelly_config.toml")
print(f"wrote skelly_config.toml ({N_FIBERS} fibers)")
