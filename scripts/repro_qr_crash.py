#!/usr/bin/env python3
"""Minimal repro for the TPU worker crash in fd_fiber.factorize (round 3).

chip_session5: every bench_oocyte run (both evaluators) died with
'UNAVAILABLE: TPU worker process crashed or restarted' at the first step
after commit dbfcc47 switched the fiber preconditioner build from
jnp.linalg.inv to batched Householder QR + solve_triangular. This script
isolates which linalg primitive kills the v5e worker at the production
batch shape (3000 x 128 x 128, f32).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

stage = sys.argv[1] if len(sys.argv) > 1 else "all"
B, m = (int(sys.argv[2]), int(sys.argv[3])) if len(sys.argv) > 4 else (3000, 128)

print("devices:", jax.devices(), file=sys.stderr)
rng = np.random.default_rng(0)
A = jnp.asarray(rng.normal(size=(B, m, m)).astype(np.float32))
# mimic the BC row scaling: a few tiny rows
A = A.at[:, :4, :].multiply(1e-6)


def timed(name, fn):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn())
    print(f"{name}: ok {time.perf_counter() - t0:.2f}s "
          f"finite={bool(jnp.all(jnp.isfinite(out)))}", flush=True)


if stage in ("all", "inv"):
    timed("inv", jax.jit(jax.vmap(jnp.linalg.inv)).lower(A).compile().__call__ if False else lambda: jax.vmap(jnp.linalg.inv)(A))
if stage in ("all", "qr"):
    timed("qr", lambda: jax.vmap(jnp.linalg.qr)(A)[0])
if stage in ("all", "qrsolve"):
    def qr_inv(a):
        q, r = jnp.linalg.qr(a)
        return jax.scipy.linalg.solve_triangular(r, q.T, lower=False)
    timed("qrsolve", lambda: jax.vmap(qr_inv)(A))
print("done", flush=True)
