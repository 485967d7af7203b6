#!/usr/bin/env python3
"""Oocyte: surface-of-revolution periphery with a cortical fiber array.

Scaled-down sibling of the reference's examples/oocyte (3000 fibers, 6000
surface nodes); raise N_FIBERS / n_nodes_target toward full scale.
"""

from skellysim_tpu.config import Config, Fiber, Periphery

N_FIBERS = 300

config = Config()
config.params.eta = 1.0
config.params.dt_initial = 1e-2
config.params.dt_max = 1e-2
config.params.dt_write = 0.1
config.params.t_final = 10.0
config.params.gmres_tol = 1e-8
config.params.seed = 350
# "pallas" is fastest below ~1e5 interaction points; at full scale
# (3000 fibers + large shells) switch to the O(N) tier: "ewald" with
# gmres_tol >= 1e-4 under precision = "single" (docs/getting_started.md)
config.params.pair_evaluator = "direct"

envelope = {
    "height": "0.5 * T * ((1 + 2*x/length)**p1) * ((1 - 2*x/length)**p2) * length",
    "T": 0.72, "p1": 0.4, "p2": 0.2, "length": 7.5,
    "lower_bound": -3.75, "upper_bound": 3.75,
    "n_nodes_target": 3000,
}
config.periphery = Periphery(shape="surface_of_revolution", n_nodes=3000,
                             envelope=envelope,
                             precompute_file="periphery_precompute.npz")

config.fibers = [Fiber(length=1.0, bending_rigidity=2.5e-3, force_scale=-0.05,
                       minus_clamped=True, n_nodes=32) for _ in range(N_FIBERS)]
config.periphery.move_fibers_to_surface(config.fibers, ds_min=0.1, seed=100)
config.save("skelly_config.toml")
print(f"wrote skelly_config.toml ({N_FIBERS} fibers)")
