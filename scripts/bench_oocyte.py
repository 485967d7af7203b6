#!/usr/bin/env python3
"""Reproducible oocyte-scale step benchmark (BASELINE.md metric 2).

Builds the flagship configuration — a fiber array clamped to a
surface-of-revolution periphery (the reference's examples/oocyte) — at full
scale, runs a few implicit timesteps, and reports compile and per-step wall
time plus GMRES iteration counts for the chosen pair evaluator.

The geometry/precompute npz is cached in the workdir so evaluator A/B runs
share it. Typical use on the TPU chip:

    python scripts/bench_oocyte.py --evaluator pallas --steps 3
    python scripts/bench_oocyte.py --evaluator ewald  --steps 3
    python scripts/bench_oocyte.py --evaluator ewald  --profile-dir /tmp/prof

Prints one JSON line per run (plus log lines on stderr).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_config(args, geometry=True):
    from skellysim_tpu.config import Config, Fiber, Periphery

    config = Config()
    p = config.params
    p.eta = 1.0
    p.dt_initial = args.dt_initial
    p.dt_max = 1e-2
    p.dt_write = 1.0
    p.t_final = 10.0
    p.gmres_tol = args.tol
    p.seed = 350
    p.pair_evaluator = args.evaluator
    p.precision = args.precision
    p.periphery_interaction_flag = args.walls
    p.gmres_warm_start = args.warm
    if args.binding:
        # NOTE: binding + minus-clamped surface fibers is over-constrained
        # at t=0 — the whole-fiber collision criterion (faithfully matching
        # fiber_finite_difference.cpp:80-87) marks every surface-clamped
        # fiber plus-hinged as well. Binding belongs to body-nucleated
        # configs; it is OFF by default here.
        p.periphery_binding.active = True
        p.periphery_binding.threshold = 0.3
    if args.ewald_a is not None:
        p.ewald_a = args.ewald_a
    if args.plan_skin is not None:
        p.ewald_plan_skin = args.plan_skin
    if args.points_per_a is not None:
        p.ewald_points_per_a = args.points_per_a
    if args.cut_in_a is not None:
        p.ewald_cut_in_a = args.cut_in_a
    p.ewald_near_mxu = args.near_mxu
    p.ewald_near_poly = args.near_poly
    if args.gmres_restart is not None:
        p.gmres_restart = args.gmres_restart
    if args.gmres_segmented:
        p.gmres_segmented = True
    p.fiber_precond_bf16 = args.fiber_precond_bf16
    p.ewald_hybrid = args.hybrid

    if args.shape == "ellipsoid":
        # the reference's examples/ellipsoid config: 2000 fibers x 64 nodes
        # on an a=7.8, b=c=4.16 ellipsoidal periphery with 8000 nodes
        # (examples/ellipsoid/gen_config.py, skelly_config.py:548-550)
        config.periphery = Periphery(shape="ellipsoid", a=7.8, b=4.16,
                                     c=4.16, n_nodes=args.shell_nodes,
                                     precompute_file="periphery_precompute.npz")
    else:
        L = 7.5 * args.shell_scale
        envelope = {
            "height": "0.5 * T * ((1 + 2*x/length)**p1) * ((1 - 2*x/length)**p2)"
                      " * length",
            "T": 0.72, "p1": 0.4, "p2": 0.2, "length": L,
            "lower_bound": -L / 2, "upper_bound": L / 2,
            "n_nodes_target": args.shell_nodes,
        }
        config.periphery = Periphery(shape="surface_of_revolution",
                                     n_nodes=args.shell_nodes,
                                     envelope=envelope,
                                     precompute_file="periphery_precompute.npz")
    if not geometry:
        return config
    config.fibers = [Fiber(length=1.0, bending_rigidity=2.5e-3,
                           force_scale=-0.05, minus_clamped=True,
                           n_nodes=args.fiber_nodes)
                     for _ in range(args.fibers)]
    config.periphery.move_fibers_to_surface(config.fibers, ds_min=args.ds_min,
                                            seed=100)
    return config


def hbm_stats():
    """Peak/current HBM use of the first accelerator, if the backend
    exposes memory_stats (TPU does; CPU returns None)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    gib = 1024 ** 3
    return {k: round(stats[v] / gib, 3)
            for k, v in [("hbm_in_use_gib", "bytes_in_use"),
                         ("hbm_peak_gib", "peak_bytes_in_use"),
                         ("hbm_limit_gib", "bytes_limit")]
            if v in stats}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--fibers", type=int, default=3000)
    ap.add_argument("--fiber-nodes", type=int, default=32)
    ap.add_argument("--shell-nodes", type=int, default=4000)
    ap.add_argument("--evaluator", default="ewald",
                    choices=["direct", "pallas", "ewald"])
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--precision", default="single")
    ap.add_argument("--no-walls", dest="walls", action="store_false",
                    help="disable periphery repulsion")
    ap.add_argument("--binding", action="store_true",
                    help="enable periphery plus-end binding (over-constrains "
                         "surface-clamped fibers; see build_config)")
    ap.add_argument("--no-warm", dest="warm", action="store_false",
                    help="disable the GMRES warm start (Belos x0=0 parity)")
    ap.add_argument("--ewald-a", type=float, default=None)
    ap.add_argument("--points-per-a", type=float, default=None)
    ap.add_argument("--cut-in-a", type=float, default=None)
    ap.add_argument("--near-mxu", action="store_true",
                    help="near-field output contractions on the MXU")
    ap.add_argument("--near-poly", action="store_true",
                    help="FMA-only polynomial screened coefficients")
    ap.add_argument("--matrix-free", action="store_true",
                    help="device-built matrix-free shell operator + bf16 "
                         "NS-inverse preconditioner (the >=1e6-point "
                         "regime: stored dense operators would not fit)")
    ap.add_argument("--shape", default="revolution",
                    choices=["revolution", "ellipsoid"],
                    help="periphery shape: the oocyte revolution envelope "
                         "or the examples/ellipsoid a=7.8,b=c=4.16 surface")
    ap.add_argument("--plan-skin", type=float, default=None,
                    help="params.ewald_plan_skin override (fraction of "
                         "r_cut; 0 = rebuild plans every step)")
    ap.add_argument("--ds-min", type=float, default=0.03,
                    help="minimum fiber spacing on the periphery surface")
    ap.add_argument("--dt-initial", type=float, default=1e-2,
                    help="initial timestep (cold-start solves condition "
                         "as ~I + dt*K; a dt ramp is the standard entry "
                         "into stiff large-N configs)")
    ap.add_argument("--gmres-segmented", action="store_true",
                    help="force params.gmres_segmented (Arnoldi-continuation "
                         "segments) below the 1.2M-DOF auto threshold")
    ap.add_argument("--gmres-restart", type=int, default=None,
                    help="params.gmres_restart override. The auto cap sizes "
                         "the Krylov basis from HBM (15%%), which at 1M "
                         "points allocates 2 GB the tol-1e-4 solve (0-5 "
                         "iters/step) never touches — the r4b retry OOMed "
                         "at compile by 2.8 GB with it")
    ap.add_argument("--shell-scale", type=float, default=1.0,
                    help="scale the revolution shell geometry (>=1e6-point "
                         "runs keep the reference's ~0.1 fiber spacing by "
                         "growing the surface, not by overlapping fibers)")
    ap.add_argument("--no-hybrid", dest="hybrid", action="store_false",
                    help="force every coupling through the ewald tier "
                         "(disable the measured/heuristic hybrid)")
    ap.add_argument("--fiber-precond-bf16", action="store_true",
                    help="bf16 fiber block-Jacobi inverse (precond-only "
                         "HBM lever; see fd_fiber.factorize)")
    ap.add_argument("--shell-build", default="device",
                    choices=["device", "npz"],
                    help="dense-shell operator provenance: 'device' builds "
                         "A/M_inv on chip from O(N) geometry (Newton-Schulz "
                         "inverse; ~seconds), 'npz' mirrors the reference "
                         "workflow (offline f64 precompute, then ships the "
                         "two (3N)^2 dense operators host->device — 1.8-4.6 "
                         "GB over the tunnel, 30-180 s of init in the "
                         "session-7 legs)")
    ap.add_argument("--workdir", default=".bench_oocyte")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu); the env var "
                         "alone is unreliable under the axon sitecustomize")
    ap.add_argument("--profile-dir", default=None,
                    help="jax.profiler trace of the timed steps")
    args = ap.parse_args(argv)

    os.makedirs(args.workdir, exist_ok=True)
    os.chdir(args.workdir)

    import logging
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    # the oocyte geometry (31k-fiber surface placement + the 65 MB TOML
    # round-trip) costs ~10 min per run; cache the parsed config dict
    # keyed by the geometry args, refreshing only the params table
    import hashlib
    import pickle
    geo_key = repr((args.shape, args.fibers, args.fiber_nodes,
                    args.shell_nodes, args.ds_min,
                    getattr(args, "shell_scale", 1.0)))
    cache = f"config_cache_{hashlib.md5(geo_key.encode()).hexdigest()[:10]}.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as fh:
            cfg = pickle.load(fh)
        cfg["params"] = build_config(args, geometry=False).to_dict()["params"]
        print("config: loaded from cache", file=sys.stderr)
    else:
        config = build_config(args)
        config.save("skelly_config.toml")

        from skellysim_tpu.io import tomlio
        cfg = tomlio.load("skelly_config.toml")
        with open(cache, "wb") as fh:
            pickle.dump(cfg, fh, protocol=4)

    t0 = time.perf_counter()
    if args.matrix_free:
        # device-built shell, no stored dense operators, bf16 precond
        cfg["periphery"]["build_on_device"] = True
        cfg["periphery"]["matrix_free"] = True
    elif args.shell_build == "device":
        # dense operators assembled + NS-inverted on chip from the O(N)
        # geometry — avoids shipping 2x(3N)^2 floats over the tunnel
        cfg["periphery"]["build_on_device"] = True
    else:
        from skellysim_tpu.precompute.main import precompute_periphery
        # mutates cfg["periphery"]["n_nodes"] to the realized mesh size; the
        # npz itself is cached in the workdir across evaluator A/B runs
        if os.path.exists("periphery_precompute.npz"):
            import numpy as np
            with np.load("periphery_precompute.npz") as z:
                cfg["periphery"]["n_nodes"] = int(z["nodes"].shape[0])
        else:
            precompute_periphery(cfg)
    print(f"precompute: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    from skellysim_tpu.system.system import System

    t0 = time.perf_counter()
    system = System(cfg)
    t_init = time.perf_counter() - t0

    dof = int(system.total_solution_size())

    t0 = time.perf_counter()
    err, conv = system.step()
    t_compile_step = time.perf_counter() - t0

    if args.profile_dir:
        import jax
        jax.profiler.start_trace(args.profile_dir)

    times = []
    for _ in range(args.steps):
        system.time += system.dt  # advance so motor/binding stay in regime
        t0 = time.perf_counter()
        err, conv = system.step()
        times.append(time.perf_counter() - t0)

    if args.profile_dir:
        import jax
        jax.profiler.stop_trace()

    out = {
        "metric": f"oocyte step wall time ({args.evaluator})",
        "fibers": args.fibers,
        "fiber_nodes": args.fiber_nodes,
        "shell_nodes": int(system.shell.state.n_nodes) if system.shell else 0,
        "dof": dof,
        "walls": args.walls,
        "tol": args.tol,
        "init_s": round(t_init, 2),
        "first_step_s": round(t_compile_step, 2),
        "step_s": [round(t, 3) for t in times],
        "step_s_median": round(sorted(times)[len(times) // 2], 3),
        "fiber_error": float(err),
        "converged": bool(conv),
        # Verlet-skin plan reuse cadence (0/0 when reuse is off)
        "plan_rebuilds": int(system._plan_rebuilds),
        "plan_steps": int(system._plan_steps),
    }
    mem = hbm_stats()
    if mem:
        out.update(mem)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
