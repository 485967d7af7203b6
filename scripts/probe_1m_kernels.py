#!/usr/bin/env python3
"""Isolate the 1M-point step's kernels one at a time (r5a crash triage).

The full coupled step at 31k fibers x 32 nodes compiles but crashes the
TPU worker during execution (docs/chip_logs/r5a/oocyte_1m_try4/5). Each
leg below runs ONE suspect at the same scale/capacities so the faulting
kernel identifies itself; run legs individually with --leg to survive
worker restarts between probes.

    python scripts/probe_1m_kernels.py --leg cache     # chunked A build
    python scripts/probe_1m_kernels.py --leg stresslet # dense 6664x1.03M
    python scripts/probe_1m_kernels.py --leg near      # cluster pairlist
    python scripts/probe_1m_kernels.py --leg far       # slab spread/FFT
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _pts(n, L=9.0, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-L / 2, L / 2, (n, 3)), jnp.float32)


def leg_cache(n_fibers=31000, n_nodes=32):
    import jax
    import jax.numpy as jnp

    from skellysim_tpu.fibers import fd_fiber as ff

    rng = np.random.default_rng(1)
    x = np.zeros((n_fibers, n_nodes, 3))
    x[:, :, 2] = np.linspace(0, 1.0, n_nodes)[None, :]
    x += 0.01 * rng.normal(size=x.shape)
    x += rng.uniform(-4, 4, (n_fibers, 1, 3))
    block = ff.make_fiber_block(x, 1.0, 2.5e-3, force_scale=-0.05,
                                dtype=jnp.float32)
    ops = ff.FiberOperators.for_node_count(n_nodes, dtype=jnp.float32)
    bc_minus = jnp.full((n_fibers,), ff.BC_MINUS_CLAMPED)
    bc_plus = jnp.full((n_fibers,), ff.BC_PLUS_FREE)

    @jax.jit
    def build(b):
        c = ff.update_cache(b, ops, 1.0, jnp.float32(0.01), bc_minus,
                            bc_plus, precond_bf16=True)
        return jnp.sum(c.A_lu.astype(jnp.float32)) + jnp.sum(c.RHS)

    t0 = time.perf_counter()
    v = float(build(block))
    print(f"cache build ok: {v:.3e} ({time.perf_counter()-t0:.1f}s)")


def leg_stresslet(n_src=6664, n_trg=1030000):
    from skellysim_tpu.kernels.pallas_tpu import stresslet_apply_pallas

    import jax.numpy as jnp

    r_s = _pts(n_src, seed=2)
    r_t = _pts(n_trg, seed=3)
    S = jnp.asarray(np.random.default_rng(4).normal(size=(n_src, 3, 3)),
                    jnp.float32)
    t0 = time.perf_counter()
    u = stresslet_apply_pallas(r_s, S, r_t, 1.0)
    print(f"dense stresslet {n_src}x{n_trg} ok: "
          f"{float(jnp.sum(u)):.3e} ({time.perf_counter()-t0:.1f}s)")


def leg_near(n=1030000):
    import jax.numpy as jnp

    from skellysim_tpu.kernels.ewald import EwaldStokeslet
    from skellysim_tpu.kernels.ewald_near_cluster import near_apply_plan
    from skellysim_tpu.system.system import _pairlist_total

    r = _pts(n, seed=5)
    f = jnp.asarray(np.random.default_rng(6).normal(size=(n, 3)), jnp.float32)
    ew = EwaldStokeslet(lo=[-4.6] * 3, hi=[4.6] * 3, a=0.1111,
                        points_per_a=2.5, cut_in_a=3.0, support=7,
                        dtype=jnp.float32, grid=None)
    total = int(_pairlist_total(np.asarray(r), ew.lo, ew.r_cut))
    ew.pair_total = int(-(-int(1.5 * total + 64) // 4096) * 4096)
    print(f"pair_total {ew.pair_total}", file=sys.stderr)
    plan = ew.make_near_plan(r, r)
    t0 = time.perf_counter()
    u = near_apply_plan(plan, f, ew.a, kind="stokeslet")
    print(f"near cluster n={n} ok: {float(jnp.sum(u)):.3e} "
          f"({time.perf_counter()-t0:.1f}s)")


def leg_far(n=1030000):
    import jax.numpy as jnp

    from skellysim_tpu.kernels.ewald import EwaldStokeslet, _slab_cap

    os.environ.setdefault("SKELLY_EWALD_SPECTRA_GB", "2.4")
    r = _pts(n, seed=7)
    f = jnp.asarray(np.random.default_rng(8).normal(size=(n, 3)), jnp.float32)
    ew = EwaldStokeslet(lo=[-4.6] * 3, hi=[4.6] * 3, a=0.1111,
                        points_per_a=2.5, cut_in_a=3.0, support=7,
                        dtype=jnp.float32)
    gl = np.asarray(ew.grid.lo)
    pts = np.asarray(r)
    sx = np.floor((pts[:, 0] - gl[0]) / ew.grid.h + 0.5).astype(int)
    ew.slab_cap = int(-(-int(2 * np.bincount(sx - sx.min()).max() + 64)
                        // 128) * 128)
    from skellysim_tpu.kernels.ewald import far_field_apply

    far_plan = ew.make_far_plan(r, r)
    bins_src, bins_trg = far_plan if far_plan else (None, None)
    t0 = time.perf_counter()
    u = far_field_apply(ew.grid, r, f, r, slab_cap=ew.slab_cap,
                        bins_src=bins_src, bins_trg=bins_trg)
    import jax
    jax.block_until_ready(u)
    print(f"far slab n={n} ok: {float(jnp.sum(u)):.3e} "
          f"({time.perf_counter()-t0:.1f}s) grid={ew.grid.shape}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", required=True,
                    choices=["cache", "stresslet", "near", "far"])
    args = ap.parse_args()
    import jax

    print(f"devices: {jax.devices()}", file=sys.stderr)
    {"cache": leg_cache, "stresslet": leg_stresslet,
     "near": leg_near, "far": leg_far}[args.leg]()


if __name__ == "__main__":
    main()
