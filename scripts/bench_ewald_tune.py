#!/usr/bin/env python3
"""Tune the spectral-Ewald split on the REAL flagship geometry.

The coupled oocyte A/B (VALIDATION.md round 4) attributed the remaining
ewald-vs-dense gap at 399k DOF to per-apply cost: ewald pays ~130 ms per
GMRES matvec vs dense Pallas' 113 ms. This script sweeps the tuning knobs
that trade near-field pair work against far-field grid work — the
splitting width `a` (r_cut = cut·a vs grid h = a/ppa), the Verlet skin,
and the near-field kernel variants — on the actual benchmark geometry
(fibers placed on the periphery surface by the config generator, same
seed), timing the NEAR and FAR components separately so the winner and
the residual are attributable.

Methodology matches bench.py: each timing is the DIFFERENCE between a
2K-deep and a K-deep jitted dependency chain, which cancels the ~25 ms
fixed per-call overhead of the tunneled TPU backend.

Prints one JSON line per sweep point. Typical chip use:

    python scripts/bench_ewald_tune.py --fibers 3000 --fiber-nodes 32 \
        --shell-nodes 6000 --ds-min 0.1 --a-scales 0.7,1.0,1.4,2.0

Reference match: PVFMM's multipole-order/tree-depth tuning fills this
role for the reference's FMM tier (kernels.hpp:56-134); it ships fixed
defaults and no tuner.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _chain(fn, args, K):
    """Seconds per fn(*args) via 2K-vs-K chain differencing."""
    import jax
    import jax.numpy as jnp

    def make(k):
        @jax.jit
        def run(*a):
            def body(i, acc):
                u = fn(a[0] + acc * 1e-3, *a[1:])
                return jnp.sum(u) * 1e-8
            return jax.lax.fori_loop(0, k, body,
                                     jnp.asarray(0.0, jnp.float32))
        return run

    r1, r2 = make(K), make(2 * K)
    import numpy as np
    assert np.isfinite(float(r1(*args))) and np.isfinite(float(r2(*args)))
    t0 = time.perf_counter(); float(r1(*args)); d1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(r2(*args)); d2 = time.perf_counter() - t0
    return max(d2 - d1, 1e-12) / K


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--fibers", type=int, default=3000)
    ap.add_argument("--fiber-nodes", type=int, default=32)
    ap.add_argument("--shell-nodes", type=int, default=6000)
    ap.add_argument("--ds-min", type=float, default=0.1)
    ap.add_argument("--shape", default="revolution",
                    choices=["revolution", "ellipsoid"])
    ap.add_argument("--a-scales", default="0.7,1.0,1.4,2.0",
                    help="multiples of the mean-spacing default a")
    ap.add_argument("--skin", type=float, default=0.25,
                    help="Verlet skin as a fraction of r_cut (plan sizing "
                         "and the wide-plan inflation both follow it)")
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--chain-k", type=int, default=8)
    ap.add_argument("--near-mxu", action="store_true")
    ap.add_argument("--near-poly", action="store_true")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from skellysim_tpu.kernels.ewald import EwaldStokeslet, far_field_apply
    from skellysim_tpu.kernels.ewald_near_cluster import near_apply_plan
    from skellysim_tpu.system.system import _pairlist_total

    # The flagship geometry, exactly as bench_oocyte builds it (same seed):
    # fiber node positions come from the config generator itself.
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_oocyte", os.path.join(os.path.dirname(os.path.abspath(
            __file__)), "bench_oocyte.py"))
    bo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bo)
    cfg_args = argparse.Namespace(
        fibers=args.fibers, fiber_nodes=args.fiber_nodes,
        shell_nodes=args.shell_nodes, ds_min=args.ds_min, shape=args.shape,
        tol=args.tol, evaluator="direct", precision="single", walls=False,
        binding=False, warm=True, ewald_a=None, plan_skin=None,
        points_per_a=None, cut_in_a=None, near_mxu=False, near_poly=False)
    t0 = time.perf_counter()
    config = bo.build_config(cfg_args)
    fib_pts = np.concatenate([np.asarray(f.x, np.float64).reshape(-1, 3)
                              for f in config.fibers], axis=0)
    # shell surface nodes (geometry only — no operators needed here)
    from skellysim_tpu.precompute import shapes as shp
    from skellysim_tpu.precompute.main import (PERIPHERY_NODE_SCALE_FACTOR
                                               as SF, _envelope_height_fn)
    if args.shape == "ellipsoid":
        surf = shp.ellipsoid(args.shell_nodes, 7.8 * SF, 4.16 * SF, 4.16 * SF)
    else:
        env = config.periphery.envelope
        env = env if isinstance(env, dict) else dict(env)
        surf = shp.surface_of_revolution(
            _envelope_height_fn(env), env["lower_bound"], env["upper_bound"],
            target_nodes=args.shell_nodes, scale_factor=SF)
    allp = np.concatenate([fib_pts, np.asarray(surf.nodes)], axis=0)
    print(f"geometry: {len(fib_pts)} fiber nodes + {len(surf.nodes)} shell "
          f"nodes in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    lo, hi = allp.min(0), allp.max(0)
    pad = 0.15 * max(float((hi - lo).max()), 1.0)
    lo, hi = lo - pad, hi + pad
    vol = float(np.prod(hi - lo))
    a0 = max((vol / len(allp)) ** (1.0 / 3.0), 1e-3)
    cut = 3.0 if args.tol >= 1e-4 else 3.5
    support = 7 if args.tol >= 1e-4 else 9

    r = jnp.asarray(allp, jnp.float32)
    f = jnp.asarray(np.random.default_rng(7).normal(size=allp.shape),
                    jnp.float32)

    def _round_up(v, q):
        return int(-(-int(v) // q) * q)

    for scale in [float(s) for s in args.a_scales.split(",")]:
        a = a0 * scale
        row = {"metric": "ewald tune", "n_points": int(len(allp)),
               "a": round(a, 5), "a_scale": scale, "cut_in_a": cut,
               "support": support, "skin_frac": args.skin}
        try:
            ew = EwaldStokeslet(lo=lo, hi=hi, a=a, points_per_a=3.0,
                                support=support, cut_in_a=cut,
                                dtype=jnp.float32, near_mxu=args.near_mxu,
                                near_poly=args.near_poly)
            row["grid"] = list(int(g) for g in ew.grid.shape)
            # geometry-informed capacities, same recipe as System
            gh = ew.grid.h
            sx = np.floor((allp[:, 0] - np.asarray(ew.grid.lo)[0]) / gh
                          + 0.5).astype(int)
            ew.slab_cap = _round_up(2.0 * np.bincount(sx - sx.min()).max()
                                    + 64, 128)
            ci = np.floor((allp - ew.lo[None, :]) / ew.cell).astype(int)
            key = ((ci[:, 0] * ew.n_cells[1] + ci[:, 1]) * ew.n_cells[2]
                   + ci[:, 2])
            ew.cap = ew.cap_t = _round_up(2.0 * np.bincount(key).max() + 32,
                                          128)
            skin = args.skin * ew.r_cut
            t0 = time.perf_counter()
            total = _pairlist_total(allp, ew.lo, ew.r_cut, skin=skin)
            ew.pair_total = _round_up(1.5 * total + 64, 4096)
            row["pair_total"] = ew.pair_total
            row["sizing_s"] = round(time.perf_counter() - t0, 2)

            sp = ew.spectra()
            t0 = time.perf_counter()
            plan = jax.block_until_ready(ew.make_near_plan(r, r, skin=skin))
            row["near_plan_s"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            far_plan = jax.block_until_ready(ew.make_far_plan(r, r))
            row["far_plan_s"] = round(time.perf_counter() - t0, 3)

            K = args.chain_k
            poly_cut = ew.r_cut if ew.near_poly else None
            row["near_s"] = round(_chain(
                lambda fv, pl: near_apply_plan(pl, fv, ew.a,
                                               kind="stokeslet",
                                               mxu=ew.near_mxu,
                                               poly_cut=poly_cut),
                (f, plan), K), 4)
            bs, bt = far_plan if far_plan is not None else (None, None)
            grid = ew.grid

            def far_only(fv, khat, phihat):
                g = grid._replace(khat=khat, phihat=phihat)
                return far_field_apply(g, r, fv, r, slab_cap=ew.slab_cap,
                                       bins_src=bs, bins_trg=bt, wide=True)

            row["far_s"] = round(_chain(far_only, (f, sp["khat"],
                                                   sp["phihat"]), K), 4)

            def full(fv, khat, phihat):
                return ew.apply_with({"khat": khat, "phihat": phihat}, r, fv,
                                     r, 1.0, plan=plan, far_plan=far_plan,
                                     wide=True)

            row["apply_s"] = round(_chain(full, (f, sp["khat"],
                                                 sp["phihat"]), K), 4)
            row["dropped_pairs"] = int(jax.device_get(plan.dropped))
        except Exception as e:  # noqa: BLE001 — a sweep point must not kill the sweep
            row["error"] = f"{type(e).__name__}: {str(e)[:200]}"
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
