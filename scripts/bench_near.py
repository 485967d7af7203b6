#!/usr/bin/env python3
"""Near-field cluster-kernel microbench: per-apply wall time at oocyte-like
density for the kernel variants (base A&S, --mxu output contractions,
--poly FMA-only coefficients), stokeslet and stresslet.

KG (pairs per Pallas grid step) is an import-time constant — sweep it from
the caller via the env var:

    SKELLY_NEAR_KG=8  python scripts/bench_near.py
    SKELLY_NEAR_KG=16 python scripts/bench_near.py --mxu --poly

Timing is the chained-fori_loop + one-readback pattern (bench.py): the
tunneled backend's block_until_ready returns instantly, so each variant
compiles+warms on the first call and is timed on the second.

Prints one JSON line with ms/apply for every (kind, variant) pair plus the
plan-build time and candidate-pair statistics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100000)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--mxu", action="store_true")
    ap.add_argument("--poly", action="store_true")
    ap.add_argument("--all-variants", action="store_true",
                    help="time every mxu/poly combination in one process")
    ap.add_argument("--cut-in-a", type=float, default=3.0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    import numpy as np

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from skellysim_tpu.kernels import ewald_near_cluster as enc
    from skellysim_tpu.system.system import _pairlist_total

    n = args.n
    # oocyte-scale density: ~100k nodes in a 7.5-long cortex; the sweep keeps
    # number density fixed as n varies (bench.py crossover convention)
    rng = np.random.default_rng(7)
    L = (n / 50000.0) ** (1.0 / 3.0) * 4.0
    r = jnp.asarray(rng.uniform(0, L, (n, 3)), jnp.float32)
    a = 1.5 * L / n ** (1.0 / 3.0)
    r_cut = args.cut_in_a * a
    lo = jnp.asarray([-2 * r_cut] * 3, jnp.float32)

    pts = np.asarray(r)
    pair_total = int(-(-int(1.5 * _pairlist_total(pts, np.asarray(lo), r_cut)
                            + 64) // 4096) * 4096)
    t0 = time.perf_counter()
    plan = jax.block_until_ready(enc.make_plan(r, r, lo, r_cut, pair_total))
    t_plan = time.perf_counter() - t0
    dropped = int(plan.dropped)
    assert dropped == 0, f"pairlist overflow: {dropped}"
    groups = int(plan.rows.size)

    def time_variant(kind, K, mxu, poly):
        pay = jnp.asarray(rng.normal(size=(n, K)), jnp.float32)
        poly_cut = float(r_cut) if poly else None

        @jax.jit
        def run(pay):
            def body(i, acc):
                u = enc.near_apply_plan(plan, pay + acc * 1e-30, a,
                                        kind=kind, mxu=mxu,
                                        poly_cut=poly_cut)
                return jnp.sum(u) * 1e-30
            return jax.lax.fori_loop(0, args.chain, body,
                                     jnp.asarray(0.0, jnp.float32))

        float(run(pay))                       # compile + warm
        t0 = time.perf_counter()
        float(run(pay))
        return (time.perf_counter() - t0) / args.chain

    variants = ([(m, p) for m in (False, True) for p in (False, True)]
                if args.all_variants else [(args.mxu, args.poly)])
    out = {
        "metric": "near-field ms/apply",
        "n": n,
        "kg": enc.KG,
        "cut_in_a": args.cut_in_a,
        "pair_total": pair_total,
        "groups": groups,
        "plan_build_s": round(t_plan, 3),
    }
    for mxu, poly in variants:
        tag = ("mxu_" if mxu else "") + ("poly" if poly else "as")
        for kind in ("stokeslet", "stresslet"):
            if mxu and kind == "stresslet":
                continue                      # MXU variant is stokeslet-only
            try:
                dt = time_variant(kind, 3 if kind == "stokeslet" else 9,
                                  mxu, poly)
                out[f"{kind}_{tag}_ms"] = round(dt * 1e3, 3)
                print(f"  {kind:9s} {tag:8s}: {dt*1e3:8.2f} ms/apply",
                      file=sys.stderr)
            except Exception as e:
                out[f"{kind}_{tag}_ms"] = None
                print(f"  {kind} {tag} failed: {type(e).__name__}: "
                      f"{str(e)[:160]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
