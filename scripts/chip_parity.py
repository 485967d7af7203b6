#!/usr/bin/env python3
"""On-chip kernel + RHS sanity: run the Pallas pairwise kernels and a tiny
coupled step on the real TPU and compare against the XLA reference path.
Diagnoses silent-zero / garbage kernel output after runtime upgrades
(the failure mode that poisons every oocyte measurement downstream).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("device:", dev, dev.platform)
    if dev.platform == "cpu":
        print("NOT A TPU — results meaningless; aborting")
        return 1

    from skellysim_tpu.kernels import pallas_tpu as kp
    from skellysim_tpu.kernels import reference as kr

    rng = np.random.default_rng(7)
    n = 1024
    r_src = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    f = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    r_trg = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)

    u_p = np.asarray(kp.stokeslet_apply(r_src, f, r_trg, 0.9))
    u_r = np.asarray(kr.stokeslet_apply(r_src, f, r_trg, 0.9))
    scale = np.abs(u_r).max()
    dev_stk = np.abs(u_p - u_r).max() / scale
    print(f"stokeslet: pallas vs reference rel dev {dev_stk:.3e} "
          f"(|u| max {scale:.3e}, pallas |u| max {np.abs(u_p).max():.3e})")

    S = jnp.asarray(rng.normal(size=(n, 3, 3)), jnp.float32)
    up = np.asarray(kp.stresslet_apply(r_src, S, r_trg, 0.9))
    ur = np.asarray(kr.stresslet_apply(r_src, S, r_trg, 0.9))
    scale = np.abs(ur).max()
    dev_str = np.abs(up - ur).max() / scale
    print(f"stresslet: pallas vs reference rel dev {dev_str:.3e} "
          f"(pallas |u| max {np.abs(up).max():.3e})")

    # tiny coupled step on chip: RHS norm must be nonzero and GMRES must
    # do real work
    from skellysim_tpu.config import Config, Fiber
    from skellysim_tpu.system import System

    config = Config()
    config.params.eta = 1.0
    config.params.dt_initial = 1e-3
    config.params.gmres_tol = 1e-5
    config.params.pair_evaluator = "pallas"
    config.params.precision = "single"
    fibs = []
    for i in range(8):
        fb = Fiber(force_scale=-0.05, length=1.0, n_nodes=32,
                   bending_rigidity=2.5e-3)
        fb.fill_node_positions(rng.uniform(-2, 2, 3), np.array([0., 0., 1.]))
        fibs.append(fb)
    config.fibers = fibs
    system = System(config.to_dict(), output_file="/tmp/chip_parity_traj.out")
    err, conv = system.step()
    sol = np.asarray(system.curr_solution)
    print(f"coupled step: err={err:.3e} conv={conv} |sol|max={np.abs(sol).max():.3e}")

    ok = dev_stk < 1e-4 and dev_str < 1e-4 and np.abs(sol).max() > 0
    print("PARITY OK" if ok else "PARITY FAIL")
    return 0 if ok else 2


if __name__ == "__main__":
    raise SystemExit(main())
