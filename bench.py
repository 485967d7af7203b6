"""Benchmark: pairwise Stokes-kernel throughput on the TPU chip.

Methodology follows the reference's harness
(tests/core/performance_hydrodynamics_combined.cpp:37-108): mean runtime per
all-pairs stokeslet evaluation at N×N, reported as pairwise interactions/s.

Timing is a K-deep chain of kernel applications (each iteration's force
depends on the previous velocity) inside ONE jitted executable with a single
scalar readback — this defeats both async-dispatch undercounting and any
result caching on tunneled backends.

Baseline: the same computation on the host CPU via XLA f64 (multithreaded),
standing in for the reference's OpenMP CPU evaluator (which needs
PVFMM/Trilinos and cannot be built here).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _chain_bench(kernel, n, K, device, dtype):
    """Mean seconds per kernel application over a K-chain.

    Times a K-deep and a 2K-deep dependency chain and uses the DIFFERENCE:
    fixed per-call overhead (remote dispatch, tunnel RTT, the scalar
    readback) is identical in both and cancels. On the tunneled TPU
    backend that overhead is ~20-40 ms per call — it inflated the round-3
    single-chain headline ~3× at n=8192 (3.36e10 vs ~9e10 pairs/s)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    a = jax.device_put(jnp.asarray(rng.uniform(-1, 1, (n, 3)), dtype), device)
    f = jax.device_put(jnp.asarray(rng.normal(size=(n, 3)), dtype), device)

    def make(k):
        @jax.jit
        def run(a, f):
            def body(i, u):
                return kernel(a, 1e-3 * u + f, a)
            return jnp.sum(jax.lax.fori_loop(0, k, body, f))
        return run

    run1, run2 = make(K), make(2 * K)
    assert np.isfinite(float(run1(a, f)))  # compile + warm
    assert np.isfinite(float(run2(a, f)))
    t0 = time.perf_counter()
    s = float(run1(a, f))
    dt1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    s = float(run2(a, f))
    dt2 = time.perf_counter() - t0
    assert np.isfinite(s)
    return max(dt2 - dt1, 1e-12) / K


def _bench_system_step(n_fibers=64, n_nodes=32, evaluator="direct"):
    """Wall time of the full jitted implicit timestep (assembly + GMRES +
    advance) for a batch of interacting fibers — the reference's
    'GMRES wall-time per timestep' headline (BASELINE.md metric 2)."""
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge

    system = ge._tiny_system(n_fibers=n_fibers, n_nodes=n_nodes,
                             precision="single", evaluator=evaluator,
                             gmres_tol=1e-5)
    args = (system.fibers.blocks, None, system.bodies.states(),
            system.point_sources, system.background,
            jnp.asarray(1e-3, system.dtype), jnp.asarray(0.0, system.dtype))
    out = system._step_fn(*args)
    jax.block_until_ready(out)
    float(out[4])  # warm the readback path
    # measure the tunnel readback latency alone, then amortize it over a
    # queue of enqueued steps closed by one readback
    t0 = time.perf_counter()
    float(out[4])
    readback = time.perf_counter() - t0
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = system._step_fn(*args)
    float(out[4])
    total = time.perf_counter() - t0
    return max(total - readback, 1e-9) / iters


def _crossover_sweep(dev, sizes=(20000, 100000, 300000, 1000000)):
    """Dense-Pallas vs spectral-Ewald apply time over N (the reference's
    n_src/n_trg sweep, performance_hydrodynamics_combined.cpp:37-108).
    Returns {n: {"dense_s": t|None, "ewald_s": t}} and prints the table."""
    import jax
    import jax.numpy as jnp

    from skellysim_tpu.kernels.ewald import EwaldStokeslet
    from skellysim_tpu.kernels.pallas_tpu import stokeslet_apply_pallas

    out = {}
    for n in sizes:
        rng = np.random.default_rng(n)
        L = (n / 50000.0) ** (1.0 / 3.0) * 4.0   # fixed density
        r = jnp.asarray(rng.uniform(0, L, (n, 3)), jnp.float32)
        fv = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
        row = {}
        if n <= 300000:   # dense beyond 3e5 ≈ tens of seconds/apply
            k = lambda a, f, t: stokeslet_apply_pallas(a, f, t, 1.0)

            def make_d(reps):
                @jax.jit
                def run_d(a, f):
                    def body(i, u):
                        return k(a, 1e-3 * u + f, a)
                    return jnp.sum(jax.lax.fori_loop(0, reps, body, f))
                return run_d

            d1, d2 = make_d(3), make_d(6)
            float(d1(r, fv)), float(d2(r, fv))
            t0 = time.perf_counter()
            float(d1(r, fv))
            dt1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(d2(r, fv))
            row["dense_s"] = max(time.perf_counter() - t0 - dt1, 1e-12) / 3
        else:
            row["dense_s"] = None
        a_split = 1.5 * L / n ** (1.0 / 3.0)
        # cut_in_a=3.0 matches the System's tol-aware production default for
        # gmres_tol >= 1e-4 (the regime this f32 tier serves)
        ew = EwaldStokeslet(lo=[0, 0, 0], hi=[L] * 3, a=a_split,
                            points_per_a=2.5, cut_in_a=3.0,
                            dtype=jnp.float32)
        # size capacities from actual occupancy (what System does)
        gl = np.asarray(ew.grid.lo)
        pts = np.asarray(r)
        sx = np.floor((pts[:, 0] - gl[0]) / ew.grid.h + 0.5).astype(int)
        ew.slab_cap = int(-(-int(2 * np.bincount(sx - sx.min()).max() + 64)
                            // 128) * 128)
        from skellysim_tpu.system.system import _pairlist_total
        ew.pair_total = int(-(-int(1.5 * _pairlist_total(
            pts, ew.lo, ew.r_cut) + 64) // 4096) * 4096)
        sp = ew.spectra()
        # production semantics: the System builds the binning plans ONCE per
        # step and shares them across every GMRES apply — prebuild them here
        plan = ew.make_near_plan(r, r)
        far_plan = ew.make_far_plan(r, r)

        def make_e(reps):
            @jax.jit
            def run_e(r_, f_, sp_):
                def body(i, acc):
                    u = ew.apply_with(sp_, r_, f_ + acc * 1e-3, r_, 1.0,
                                      plan=plan, far_plan=far_plan)
                    return jnp.sum(u) * 1e-8
                return jax.lax.fori_loop(0, reps, body,
                                         jnp.asarray(0.0, jnp.float32))
            return run_e

        try:
            e1, e2 = make_e(3), make_e(6)
            float(e1(r, fv, sp)), float(e2(r, fv, sp))
            t0 = time.perf_counter()
            float(e1(r, fv, sp))
            dt1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(e2(r, fv, sp))
            row["ewald_s"] = max(time.perf_counter() - t0 - dt1, 1e-12) / 3
        except Exception as e:
            print(f"  ewald n={n} failed: {type(e).__name__}: {str(e)[:120]}",
                  file=sys.stderr)
            row["ewald_s"] = None
        d = "-" if row["dense_s"] is None else f"{row['dense_s']*1e3:8.1f}"
        w = "-" if row["ewald_s"] is None else f"{row['ewald_s']*1e3:8.1f}"
        print(f"  crossover n={n:>7d}: dense {d} ms/apply, ewald {w} ms/apply",
              file=sys.stderr)
        out[n] = row
    return out


# v5e VPU peak: 8 vector units/core... public figure 937.5 MHz × 1024 f32
# lanes × 2 (FMA) ≈ 1.92 TFLOP/s; the pairwise kernels are VPU-bound
# (elementwise + rsqrt), not MXU-bound.
# flop counts for rate→TFLOP/s conversion only. The round-4 chip
# measurements RETRACTED the assumed "1.92 TFLOP/s VPU peak" (the kernels
# measure ABOVE it once the ~25 ms tunnel per-call overhead is differenced
# out), so no MFU ratio is reported — docs/roofline.md derives the honest
# ceiling from the empirically calibrated slot rate instead.
_STOKESLET_FLOPS_PER_PAIR = 30.0
_STRESSLET_FLOPS_PER_PAIR = 60.0


def _bench_oocyte_reference(evaluators=("pallas", "ewald"), timeout_s=2400):
    """Full-scale oocyte step A/B on the reference's own example config
    (examples/oocyte/gen_config.py: 3000 fibers, ds_min 0.1, 6000-node
    revolution shell, periphery interaction OFF) — the flagship
    'GMRES wall-time per timestep' comparison (BASELINE.md metric 2).

    Runs scripts/bench_oocyte.py as a subprocess per evaluator so a hung
    compile or downed tunnel cannot take the headline metrics with it.
    The workdir (precompute npz) and the persistent XLA compile cache make
    re-runs cheap. Skip with SKELLY_BENCH_OOCYTE=0."""
    import subprocess

    if os.environ.get("SKELLY_BENCH_OOCYTE", "1") == "0":
        return {}
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "bench_oocyte.py")
    workdir = os.environ.get("SKELLY_BENCH_OOCYTE_WORKDIR",
                             "/tmp/bench_oocyte_ref")
    out = {}
    for ev in evaluators:
        cmd = [sys.executable, script, "--evaluator", ev, "--no-walls",
               "--ds-min", "0.1", "--shell-nodes", "6000", "--steps", "3",
               "--workdir", workdir]
        try:
            res = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=timeout_s)
            line = res.stdout.strip().splitlines()[-1] if res.stdout.strip() else ""
            out[ev] = json.loads(line) if line.startswith("{") else {
                "error": (res.stderr or "no output")[-300:]}
        except subprocess.TimeoutExpired:
            out[ev] = {"error": f"timeout after {timeout_s}s"}
        except Exception as e:  # noqa: BLE001 — a bench leg must never abort the run
            out[ev] = {"error": f"{type(e).__name__}: {e}"}
        msg = out[ev].get("step_s_median", out[ev].get("error"))
        print(f"oocyte reference-config [{ev}]: {msg}", file=sys.stderr)
    return out


def main():
    # --quick / SKELLY_BENCH_OOCYTE=0 skips the two oocyte subprocesses
    # (up to ~40 min cold). They stay ON by default because the unattended
    # driver run must record the coupled A/B in BENCH_r{N}.json.
    if "--quick" in sys.argv[1:]:
        os.environ["SKELLY_BENCH_OOCYTE"] = "0"
    import jax
    import jax.numpy as jnp

    from skellysim_tpu.kernels.pallas_tpu import stokeslet_apply_pallas
    from skellysim_tpu.kernels.reference import stokeslet_apply

    print(f"devices: {jax.devices()}", file=sys.stderr)
    accel = [d for d in jax.devices() if d.platform != "cpu"]
    cpu = jax.devices("cpu")[0]

    xla_kernel = lambda a, f, t: stokeslet_apply(a, f, t, 1.0)
    pallas_kernel = lambda a, f, t: stokeslet_apply_pallas(a, f, t, 1.0)

    n_cpu = 2048
    dt_cpu = _chain_bench(xla_kernel, n_cpu, 3, cpu, jnp.float64)
    cpu_rate = n_cpu * n_cpu / dt_cpu
    print(f"cpu xla f64 n={n_cpu}: {cpu_rate:.3e} inter/s ({dt_cpu*1e3:.1f} ms)",
          file=sys.stderr)

    if accel:
        dev = accel[0]
        n = 8192
        rates = {}
        # stresslet rate (reference benchmarks both kernels); strengths are
        # rank-1 n⊗q tensors like the double-layer use sites
        from skellysim_tpu.kernels.pallas_tpu import stresslet_apply_pallas

        def _stresslet_chain(n_, K, device, dtype):
            import jax
            import jax.numpy as jnp

            rng = np.random.default_rng(1)
            r = jax.device_put(jnp.asarray(rng.uniform(-1, 1, (n_, 3)), dtype), device)
            q = jax.device_put(jnp.asarray(rng.normal(size=(n_, 3)), dtype), device)
            nrm = jax.device_put(jnp.asarray(rng.normal(size=(n_, 3)), dtype), device)

            def make(k):
                @jax.jit
                def run(r, q):
                    def body(i, u):
                        S = nrm[:, :, None] * (q + 1e-3 * u)[:, None, :]
                        return stresslet_apply_pallas(r, S, r, 1.0)
                    return jnp.sum(jax.lax.fori_loop(0, k, body, q))
                return run

            run1, run2 = make(K), make(2 * K)
            float(run1(r, q)), float(run2(r, q))
            t0 = time.perf_counter()
            float(run1(r, q))
            dt1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(run2(r, q))
            dt2 = time.perf_counter() - t0
            return max(dt2 - dt1, 1e-12) / K

        try:
            dt_str = _stresslet_chain(n, 10, dev, jnp.float32)
            print(f"tpu pallas stresslet f32 n={n}: {n*n/dt_str:.3e} inter/s "
                  f"({dt_str*1e3:.2f} ms)", file=sys.stderr)
        except Exception as e:
            print(f"stresslet bench failed: {e}", file=sys.stderr)
        # spectral-Ewald (O(N) far-field) apply rate — the FMM-tier metric;
        # equivalent dense pair count n² per apply
        def _ewald_chain(n_, K, dtype):
            from skellysim_tpu.kernels.ewald import EwaldStokeslet

            rng = np.random.default_rng(2)
            r = jnp.asarray(rng.uniform(0, 4.0, (n_, 3)), dtype)
            fv = jnp.asarray(rng.normal(size=(n_, 3)), dtype)
            ew = EwaldStokeslet(lo=[0, 0, 0], hi=[4, 4, 4], a=0.08,
                                dtype=dtype)
            sp = ew.spectra()
            plan = ew.make_near_plan(r, r)
            far_plan = ew.make_far_plan(r, r)

            @jax.jit
            def run(r, fv, sp):
                def body(i, acc):
                    u = ew.apply_with(sp, r, fv + acc * 1e-30, r, 1.0,
                                      plan=plan, far_plan=far_plan)
                    return jnp.sum(u) * 1e-30
                return jax.lax.fori_loop(0, K, body, jnp.asarray(0.0, dtype))

            float(run(r, fv, sp))  # compile + warm
            t0 = time.perf_counter()
            float(run(r, fv, sp))
            return (time.perf_counter() - t0) / K

        try:
            n_ew = 50000
            dt_ew = _ewald_chain(n_ew, 5, jnp.float32)
            print(f"tpu ewald stokeslet f32 n={n_ew}: {dt_ew*1e3:.0f} ms/apply "
                  f"(dense-equivalent {n_ew*n_ew/dt_ew:.3e} inter/s)",
                  file=sys.stderr)
        except Exception as e:
            print(f"ewald bench failed: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)
        for name, kern in [("xla", xla_kernel), ("pallas", pallas_kernel)]:
            try:
                dt = _chain_bench(kern, n, 20, dev, jnp.float32)
                rates[name] = n * n / dt
                print(f"tpu {name} f32 n={n}: {rates[name]:.3e} inter/s "
                      f"({dt*1e3:.2f} ms)", file=sys.stderr)
            except Exception as e:
                print(f"tpu {name} failed: {e}", file=sys.stderr)
        best = max(rates.values())
        value, ratio = best, best / cpu_rate
        tflops_stokeslet = best * _STOKESLET_FLOPS_PER_PAIR / 1e12
        try:
            tflops_stresslet = (n * n / dt_str * _STRESSLET_FLOPS_PER_PAIR
                                / 1e12)
        except Exception:
            tflops_stresslet = None
        print(f"VPU rates: stokeslet {tflops_stokeslet:.2f} TFLOP/s at "
              f"{_STOKESLET_FLOPS_PER_PAIR:.0f} flops/pair (no MFU ratio: "
              "the assumed peak was retracted, see docs/roofline.md)",
              file=sys.stderr)
        try:
            dt_step = _bench_system_step(evaluator="pallas")
            print(f"tpu coupled step f32 (64 fibers x 32 nodes): {dt_step*1e3:.1f} ms",
                  file=sys.stderr)
        except Exception as e:
            print(f"coupled-step bench failed: {e}", file=sys.stderr)
        try:
            crossover = _crossover_sweep(dev)
        except Exception as e:
            print(f"crossover sweep failed: {e}", file=sys.stderr)
            crossover = {}
        oocyte = _bench_oocyte_reference()
    else:
        value, ratio = cpu_rate, 1.0
        tflops_stokeslet = tflops_stresslet = None
        crossover = {}
        oocyte = {}

    record = {
        "metric": "pairwise stokeslet interactions/s/chip (f32 on-chip, chained-loop timing, vs f64 XLA-CPU baseline)",
        "value": value,
        "unit": "interactions/s",
        "vs_baseline": ratio,
        "tflops_stokeslet": tflops_stokeslet,
        "tflops_stresslet": tflops_stresslet,
        "crossover_ms_per_apply": {
            str(k): {kk: (None if vv is None else vv * 1e3)
                     for kk, vv in v.items()}
            for k, v in crossover.items()},
        "oocyte_reference_config": oocyte,
    }
    print(json.dumps(record))
    # in-repo bookkeeping (VERDICT r3 #9): persist every bench run keyed by
    # commit + device, so driver BENCH_r{N}.json files and session logs can
    # never silently diverge from what the repo records
    try:
        import subprocess
        sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True,
                             cwd=os.path.dirname(os.path.abspath(__file__))
                             ).stdout.strip() or "unknown"
        dev_tag = "accel" if accel else "cpu"
        rec_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "docs", "bench_records")
        os.makedirs(rec_dir, exist_ok=True)
        with open(os.path.join(rec_dir, f"bench_{sha}_{dev_tag}.json"),
                  "w") as fh:
            json.dump(record, fh, indent=1)
    except Exception as e:           # bookkeeping must never fail the bench
        print(f"bench record write skipped: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
