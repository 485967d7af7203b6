"""Benchmark: pairwise Stokes-kernel throughput on the TPU chip.

Methodology follows the reference's harness
(tests/core/performance_hydrodynamics_combined.cpp:37-108): mean runtime over
trials for an N_src × N_trg all-pairs stokeslet evaluation, reported as
pairwise interactions/second. The baseline is the same computation run on the
host CPU via XLA (multithreaded — a stand-in for the reference's OpenMP CPU
evaluator, which we cannot build here since it needs PVFMM/Trilinos).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _bench_backend(device, n_src, n_trg, dtype, iters=10):
    import jax
    import jax.numpy as jnp

    from skellysim_tpu.kernels.reference import stokeslet_apply

    rng = np.random.default_rng(0)
    r_src = jax.device_put(jnp.asarray(rng.uniform(-1, 1, (n_src, 3)), dtype), device)
    f_src = jax.device_put(jnp.asarray(rng.normal(size=(n_src, 3)), dtype), device)
    r_trg = jax.device_put(jnp.asarray(rng.uniform(-1, 1, (n_trg, 3)), dtype), device)

    fn = jax.jit(lambda a, b, c: stokeslet_apply(a, b, c, 1.0), device=device)
    fn(r_src, f_src, r_trg).block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(r_src, f_src, r_trg)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return (n_src * n_trg) / dt, dt


def main():
    import jax

    print(f"devices: {jax.devices()}", file=sys.stderr)
    tpu_devices = [d for d in jax.devices() if d.platform != "cpu"]
    cpu = jax.devices("cpu")[0]

    n = 8192
    import jax.numpy as jnp

    # CPU baseline (f64, like the reference's CPU evaluator)
    cpu_rate, cpu_dt = _bench_backend(cpu, n, n, jnp.float64, iters=3)
    print(f"cpu f64: {cpu_rate:.3e} inter/s ({cpu_dt*1e3:.1f} ms)", file=sys.stderr)

    if tpu_devices:
        dev = tpu_devices[0]
        rate32, dt32 = _bench_backend(dev, n, n, jnp.float32, iters=10)
        print(f"tpu f32: {rate32:.3e} inter/s ({dt32*1e3:.2f} ms)", file=sys.stderr)
        value, ratio = rate32, rate32 / cpu_rate
    else:
        value, ratio = cpu_rate, 1.0

    print(json.dumps({
        "metric": "pairwise stokeslet interactions/s/chip (N=8192^2, f32 TPU vs f64 XLA-CPU baseline)",
        "value": value,
        "unit": "interactions/s",
        "vs_baseline": ratio,
    }))


if __name__ == "__main__":
    main()
