"""Benchmark: pairwise Stokes-kernel throughput on the TPU chip.

Methodology follows the reference's harness
(tests/core/performance_hydrodynamics_combined.cpp:37-108): mean runtime per
all-pairs stokeslet evaluation at N×N, reported as pairwise interactions/s.

Timing is a K-deep chain of kernel applications (each iteration's force
depends on the previous velocity) inside ONE jitted executable with a single
scalar readback; differencing a 2K- against a K-deep chain cancels the
fixed per-call overhead (remote dispatch, tunnel RTT, readback — ~20-40 ms
on the tunneled backend). Several (dt1, dt2) pairs are taken and the median
difference used; a pair spread larger than the difference flags the
measurement as noisy instead of silently clamping.

Baseline: the same computation on the host CPU via XLA f64 (multithreaded),
standing in for the reference's OpenMP CPU evaluator (which needs
PVFMM/Trilinos and cannot be built here).

Output contract (the driver parses this): exactly ONE JSON line on stdout,
printed EARLY — right after the quick kernel benches (~2-4 min) — with
deep-leg fields (crossover sweep, oocyte A/B) filled from the newest cached
record in docs/bench_records/ when available. The deep legs then re-run
under one global wall-clock budget (SKELLY_BENCH_BUDGET_S, default 2700 s,
measured from process start) with graceful per-leg skipping, and the
refreshed record is persisted to docs/bench_records/ — never printed as a
second stdout line. `--quick` skips the deep legs entirely.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

import numpy as np

_T0 = time.perf_counter()
_REPO = os.path.dirname(os.path.abspath(__file__))
_REC_DIR = os.path.join(_REPO, "docs", "bench_records")


def _budget_s():
    try:
        return float(os.environ.get("SKELLY_BENCH_BUDGET_S", "2700"))
    except ValueError:
        return 2700.0


def _remaining_s():
    return _budget_s() - (time.perf_counter() - _T0)


def _diff_pairs(run1, run2, K, n_pairs=3):
    """Median of several (dt1, dt2) chain pairs → seconds per application.

    Returns (dt_per_apply, ok): ok=False when the median difference is
    below 25% of the median dt1 (the differencing signal is then buried in
    per-call noise and the rate would be unreliable)."""
    diffs, dt1s = [], []
    for _ in range(n_pairs):
        t0 = time.perf_counter()
        float(run1())
        dt1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run2())
        dt2 = time.perf_counter() - t0
        diffs.append(dt2 - dt1)
        dt1s.append(dt1)
    diffs.sort()
    d = diffs[len(diffs) // 2]
    ok = d > 1e-9 and d > 0.05 * sorted(dt1s)[len(dt1s) // 2]
    return max(d, 1e-12) / K, ok


def _chain_bench(kernel, n, K, device, dtype, n_pairs=3):
    """Mean seconds per kernel application over a K-chain (2K−K differenced,
    median over n_pairs)."""
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
    dt, ok = _diff_pairs(lambda: run1(a, f), lambda: run2(a, f), K, n_pairs)
    if not ok:
        print(f"warning: chain differencing noisy at n={n} (rate suspect)",
              file=sys.stderr)
    return dt


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


def _load_cached_record(keys=("crossover_ms_per_apply",
                              "oocyte_reference_config")):
    """Per-KEY newest non-empty value across committed records in
    docs/bench_records/. A budget-limited run persists its record with
    empty deep legs; taking the newest record wholesale would let that
    shadow an older complete sweep (observed: bench_5d977de clobbered the
    0506648 crossover table)."""
    recs = []
    for path in glob.glob(os.path.join(_REC_DIR, "bench_*.json")):
        try:
            with open(path) as fh:
                recs.append((os.path.getmtime(path), os.path.basename(path),
                             json.load(fh)))
        except Exception:
            continue
    recs.sort(reverse=True)                      # newest first
    out = {}
    for key in keys:
        for _, fname, rec in recs:
            if rec.get(key):
                out[key] = (rec[key], fname)
                break
    return out or None  # {key: (value, filename)} or None


def _crossover_sweep(dev, sizes=(20000, 100000, 300000)):
    """Dense-Pallas vs spectral-Ewald apply time over N (the reference's
    n_src/n_trg sweep, performance_hydrodynamics_combined.cpp:37-108).
    Returns {n: {"dense_s": t|None, "ewald_s": t}} and prints the table.
    Respects the global budget: stops before a size it cannot finish."""
    import jax
    import jax.numpy as jnp

    from skellysim_tpu.kernels.ewald import EwaldStokeslet
    from skellysim_tpu.kernels.pallas_tpu import stokeslet_apply_pallas

    out = {}
    for n in sizes:
        # rough cost model: compile + runs grow with n; keep a safety floor
        if _remaining_s() < 60 + n / 2000:
            print(f"  crossover n={n}: skipped (budget)", file=sys.stderr)
            break
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
            dt, _ = _diff_pairs(lambda: d1(r, fv), lambda: d2(r, fv), 3,
                                n_pairs=3 if n <= 100000 else 1)
            row["dense_s"] = dt
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
            dt, _ = _diff_pairs(lambda: e1(r, fv, sp),
                                lambda: e2(r, fv, sp), 3,
                                n_pairs=3 if n <= 100000 else 1)
            row["ewald_s"] = dt
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


# flop counts for rate→TFLOP/s conversion. The MFU denominator is the
# microbenchmark-calibrated VPU ceiling (docs/roofline.md "calibrated
# ceiling"): measured transcendental-free FMA-chain slot rate on this chip,
# persisted by scripts/bench_vpu_ops.py into docs/bench_records/ as
# vpu_ceiling_tflops. Without a calibration record no ratio is reported
# (the naive 1.92 TFLOP/s datasheet-derived figure was measured-exceeded
# and retracted in round 4).
_STOKESLET_FLOPS_PER_PAIR = 30.0
_STRESSLET_FLOPS_PER_PAIR = 60.0


def _load_vpu_ceiling():
    path = os.path.join(_REC_DIR, "vpu_ceiling.json")
    try:
        with open(path) as fh:
            return json.load(fh)
    except Exception:
        return None


def _load_vpu_ops():
    path = os.path.join(_REC_DIR, "vpu_ops_latest.json")
    try:
        with open(path) as fh:
            return json.load(fh)
    except Exception:
        return None


def _bench_oocyte_reference(evaluators=("pallas", "ewald")):
    """Full-scale oocyte step A/B on the reference's own example config
    (examples/oocyte/gen_config.py: 3000 fibers, ds_min 0.1, 6000-node
    revolution shell, periphery interaction OFF) — the flagship
    'GMRES wall-time per timestep' comparison (BASELINE.md metric 2).

    Runs scripts/bench_oocyte.py as a subprocess per evaluator so a hung
    compile or downed tunnel cannot take the headline metrics with it.
    Per-leg timeout = remaining global budget. Skip with
    SKELLY_BENCH_OOCYTE=0."""
    import subprocess

    if os.environ.get("SKELLY_BENCH_OOCYTE", "1") == "0":
        return {}
    script = os.path.join(_REPO, "scripts", "bench_oocyte.py")
    workdir = os.environ.get("SKELLY_BENCH_OOCYTE_WORKDIR",
                             "/tmp/bench_oocyte_ref")
    out = {}
    for ev in evaluators:
        tmo = _remaining_s()
        if tmo < 300:
            out[ev] = {"error": "skipped (budget)"}
            print(f"oocyte reference-config [{ev}]: skipped (budget)",
                  file=sys.stderr)
            continue
        cmd = [sys.executable, script, "--evaluator", ev, "--no-walls",
               "--ds-min", "0.1", "--shell-nodes", "6000", "--steps", "3",
               "--workdir", workdir]
        try:
            res = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=tmo)
            line = res.stdout.strip().splitlines()[-1] if res.stdout.strip() else ""
            out[ev] = json.loads(line) if line.startswith("{") else {
                "error": (res.stderr or "no output")[-300:]}
        except subprocess.TimeoutExpired:
            out[ev] = {"error": f"timeout after {tmo:.0f}s (budget)"}
        except Exception as e:  # noqa: BLE001 — a bench leg must never abort the run
            out[ev] = {"error": f"{type(e).__name__}: {e}"}
        msg = out[ev].get("step_s_median", out[ev].get("error"))
        print(f"oocyte reference-config [{ev}]: {msg}", file=sys.stderr)
    return out


def _persist(record, accel):
    """In-repo bookkeeping: persist every bench run keyed by commit+device so
    driver BENCH_r{N}.json files and session logs can never silently diverge
    from what the repo records."""
    try:
        import subprocess
        sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True,
                             cwd=_REPO).stdout.strip() or "unknown"
        dev_tag = "accel" if accel else "cpu"
        os.makedirs(_REC_DIR, exist_ok=True)
        with open(os.path.join(_REC_DIR, f"bench_{sha}_{dev_tag}.json"),
                  "w") as fh:
            json.dump(record, fh, indent=1)
    except Exception as e:           # bookkeeping must never fail the bench
        print(f"bench record write skipped: {e}", file=sys.stderr)


def main():
    quick = "--quick" in sys.argv[1:]
    import jax
    import jax.numpy as jnp

    from skellysim_tpu.kernels.pallas_tpu import (stokeslet_apply_pallas,
                                                  stresslet_apply_pallas)
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

    dt_str = None
    rates = {}
    if accel:
        dev = accel[0]
        n = 8192
        # stresslet rate (reference benchmarks both kernels); strengths are
        # rank-1 n⊗q tensors like the double-layer use sites

        def _stresslet_chain(n_, K, device, dtype):
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
            dt, _ = _diff_pairs(lambda: run1(r, q), lambda: run2(r, q), K)
            return dt

        try:
            dt_str = _stresslet_chain(n, 10, dev, jnp.float32)
            print(f"tpu pallas stresslet f32 n={n}: {n*n/dt_str:.3e} inter/s "
                  f"({dt_str*1e3:.2f} ms)", file=sys.stderr)
        except Exception as e:
            print(f"stresslet bench failed: {e}", file=sys.stderr)

        for name, kern in [("xla", xla_kernel), ("pallas", pallas_kernel)]:
            try:
                dt = _chain_bench(kern, n, 20, dev, jnp.float32)
                rates[name] = n * n / dt
                print(f"tpu {name} f32 n={n}: {rates[name]:.3e} inter/s "
                      f"({dt*1e3:.2f} ms)", file=sys.stderr)
            except Exception as e:
                print(f"tpu {name} failed: {e}", file=sys.stderr)

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

        dt_ew = None
        try:
            n_ew = 50000
            dt_ew = _ewald_chain(n_ew, 5, jnp.float32)
            print(f"tpu ewald stokeslet f32 n={n_ew}: {dt_ew*1e3:.0f} ms/apply "
                  f"(dense-equivalent {n_ew*n_ew/dt_ew:.3e} inter/s)",
                  file=sys.stderr)
        except Exception as e:
            print(f"ewald bench failed: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)

        dt_step = None
        try:
            dt_step = _bench_system_step(evaluator="pallas")
            print(f"tpu coupled step f32 (64 fibers x 32 nodes): {dt_step*1e3:.1f} ms",
                  file=sys.stderr)
        except Exception as e:
            print(f"coupled-step bench failed: {e}", file=sys.stderr)

        best = max(rates.values()) if rates else cpu_rate
        value, ratio = best, best / cpu_rate
    else:
        value, ratio = cpu_rate, 1.0
        dt_ew = dt_step = None

    tflops_stokeslet = value * _STOKESLET_FLOPS_PER_PAIR / 1e12 if accel else None
    tflops_stresslet = (8192 * 8192 / dt_str * _STRESSLET_FLOPS_PER_PAIR / 1e12
                        if dt_str else None)
    # MFU in EXECUTED SLOTS, not nominal flops: the compiled kernel runs
    # ~10.4 VPU ops/pair (CSE + FMA fusion; measured by bench_vpu_ops)
    # against the 30-flops/pair algorithmic accounting, so nominal TFLOP/s
    # can exceed the hardware op ceiling. MFU = pairs/s x measured
    # slots/pair / calibrated max issue rate (docs/roofline.md round 5).
    ceiling = _load_vpu_ceiling()
    ops_rec = _load_vpu_ops()
    mfu = None
    slot_ceiling = (ceiling or {}).get("slot_ceiling_ops_per_s")
    slots_per_pair = (ops_rec or {}).get("full_slots_per_pair_measured")
    if accel and slot_ceiling and slots_per_pair and value:
        mfu = value * slots_per_pair / slot_ceiling
        print(f"VPU rates: stokeslet {tflops_stokeslet:.2f} nominal TFLOP/s "
              f"(30 flops/pair accounting); executed-slot MFU "
              f"{mfu*100:.0f}% ({slots_per_pair:.1f} slots/pair vs the "
              f"calibrated {slot_ceiling:.3e} ops/s issue ceiling)",
              file=sys.stderr)
    elif tflops_stokeslet:
        print(f"VPU rates: stokeslet {tflops_stokeslet:.2f} TFLOP/s at "
              f"{_STOKESLET_FLOPS_PER_PAIR:.0f} flops/pair (no calibrated "
              "ceiling record; run scripts/bench_vpu_ops.py --calibrate)",
              file=sys.stderr)

    # ------- headline JSON: printed NOW, before any deep leg -------
    cached = _load_cached_record()
    record = {
        "metric": "pairwise stokeslet interactions/s/chip (f32 on-chip, chained-loop timing, vs f64 XLA-CPU baseline)",
        "value": value,
        "unit": "interactions/s",
        "vs_baseline": ratio,
        "tflops_stokeslet": tflops_stokeslet,
        "tflops_stresslet": tflops_stresslet,
        "mfu_vs_calibrated_ceiling": mfu,
        "ewald_ms_per_apply_50k": dt_ew * 1e3 if accel and dt_ew else None,
        "coupled_step_ms_64x32": dt_step * 1e3 if accel and dt_step else None,
        "crossover_ms_per_apply": {},
        "oocyte_reference_config": {},
    }
    if cached:
        for key, (val, fname) in cached.items():
            record[key] = val
            record[key + "_source"] = f"cached:{fname}"
    print(json.dumps(record))
    sys.stdout.flush()

    # ------- deep legs: refresh under the remaining global budget -------
    if accel and not quick:
        try:
            crossover = _crossover_sweep(accel[0])
            if crossover:
                record["crossover_ms_per_apply"] = {
                    str(k): {kk: (None if vv is None else vv * 1e3)
                             for kk, vv in v.items()}
                    for k, v in crossover.items()}
                record.pop("crossover_ms_per_apply_source", None)
        except Exception as e:
            print(f"crossover sweep failed: {e}", file=sys.stderr)
        _persist(record, accel)   # partial persist before the long legs
        oocyte = _bench_oocyte_reference()
        if oocyte and not all(
                v.get("error", "").startswith("skipped") for v in oocyte.values()):
            record["oocyte_reference_config"] = oocyte
            record.pop("oocyte_reference_config_source", None)
    _persist(record, accel)


if __name__ == "__main__":
    main()
