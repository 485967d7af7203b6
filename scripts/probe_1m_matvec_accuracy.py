#!/usr/bin/env python3
"""Is the 4M-DOF ewald matvec ACCURATE? (1M-run triage, round 5 session 2)

The 31k-fiber solve drops to ~3e-3 relative in 8 iterations and then
crawls (r5b try17/18), while the same knobs converge in ONE iteration at
600k DOF — consistent with GMRES fighting an operator error floor rather
than slow physics. This probes the fiber-tier stokeslet evaluator on the
REAL try-config geometry: ewald apply vs the dense pallas sum over all
~1M sources at a random target sample.

Two ewald paths are probed:
  sampled  - fresh apply() straight to the 128 sampled targets (pure math
             accuracy at this box / splitting width)
  full     - apply() to ALL targets like the production matvec, then read
             the same 128 entries (adds the full-target capacity sizing)

Prints one JSON line. Chip-time cost ~= one init + two applies.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    fibers = int(os.environ.get("PROBE_FIBERS", "31000"))
    shell_scale = float(os.environ.get("PROBE_SHELL_SCALE", "3.2"))

    import hashlib
    import pickle

    workdir = os.environ.get("PROBE_WORKDIR", "/tmp/bench_oocyte_1m_r5b")
    os.chdir(workdir)
    geo_key = repr(("revolution", fibers, 32, 8000, 0.1, shell_scale))
    cache = f"config_cache_{hashlib.md5(geo_key.encode()).hexdigest()[:10]}.pkl"
    with open(cache, "rb") as fh:
        cfg = pickle.load(fh)
    cfg["params"]["pair_evaluator"] = "ewald"
    cfg["params"]["precision"] = "single"
    cfg["periphery"]["build_on_device"] = True
    cfg["periphery"]["matrix_free"] = True
    print("config loaded from cache", file=sys.stderr)

    import logging
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    import jax.numpy as jnp
    import numpy as np

    from skellysim_tpu.system import fiber_system as fs
    from skellysim_tpu.system.system import System

    system = System(cfg)
    stk, _ = system._ewald_pair
    r_fib = np.asarray(fs.positions(system.fibers.blocks))
    n = r_fib.shape[0]
    rng = np.random.default_rng(0)
    f = rng.normal(size=(n, 3)).astype(np.float32)
    idx = rng.choice(n, size=128, replace=False)
    trg = r_fib[idx]

    r_d = jnp.asarray(r_fib, jnp.float32)
    f_d = jnp.asarray(f, jnp.float32)

    # ewald, fresh plan straight at the sample
    u_sampled = np.asarray(stk.apply(r_d, f_d, jnp.asarray(trg, jnp.float32)))
    # ewald, production-style full-target apply
    u_full = np.asarray(stk.apply(r_d, f_d, r_d))[idx]

    # dense pallas reference over ALL sources (f32 sum over 1M terms:
    # ~1e-4-class roundoff, far below the suspected 1e-2-class error)
    from skellysim_tpu.kernels.pallas_tpu import stokeslet_apply_pallas
    u_dense = np.asarray(stokeslet_apply_pallas(
        r_d, f_d, jnp.asarray(trg, jnp.float32)))

    scale = np.linalg.norm(u_dense) / np.sqrt(u_dense.size)

    def rel(a, b):
        return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30))

    out = {
        "n_sources": int(n),
        "ewald_a": float(stk.a),
        "rel_sampled_vs_dense": rel(u_sampled, u_dense),
        "rel_full_vs_dense": rel(u_full, u_dense),
        "rel_full_vs_sampled": rel(u_full, u_sampled),
        "max_abs_sampled_vs_dense": float(np.max(np.abs(u_sampled - u_dense)) / scale),
        "u_rms": float(scale),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
