#!/usr/bin/env python3
"""Price the pairwise kernels' VPU instruction classes on the real chip.

ROUND-4 REWRITE — the round-3 version of this script produced garbage:
it reported 3.0e12 pairs/s for the full stokeslet kernel, 65× over the
VPU slot bound (23 slots/pair at 0.96e12 slots/s ⇒ ≤ 4.2e10 pairs/s) and
90× faster than the production chained-loop measurement of the SAME
kernel (3.36e10 pairs/s, BENCH_r03) — so its published slot prices
(rsqrt 0.04, select ≈0, total 0.32 slots/pair) were a timing artifact,
not measurements. The likely hole: its chained applies fed back through
`f + u·1e-20`, which f32 rounds to exactly `f`, and the identical
repeated executions were then eliminated/overlapped somewhere in the
remote-dispatch path.

This version:
  * reduces every chain to ONE scalar and reads it back with float() —
    on the tunneled backend block_until_ready measures only dispatch,
  * times a K-deep and a 2K-deep chain and uses the DIFFERENCE, so the
    ~25 ms per-call overhead (tunnel RTT + dispatch + readback) cancels,
  * CALIBRATES the VPU rate empirically (_measure_vpu_peak) instead of
    assuming a lane count — the first valid chip run showed the old
    "937.5 MHz × 1024 lanes" peak and the 23-slot/pair analytic budget
    are BOTH wrong (the production kernel sustains 8.6e10 pairs/s ≈
    2.6 TFLOP/s, over the assumed 1.92 peak; FMA fusion shrinks budgets),
  * gates validity on marginal-repeat stability (an elided chain shows up
    as a near-zero or irreproducible margin), withholding prices otherwise,
  * A/Bs the stresslet's round-3 select change (single-select vs the
    original double-where) to settle the supposed 63.0→60.3 regression.

Prints one JSON line. See docs/roofline.md.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from skellysim_tpu.kernels.pallas_tpu import (CHUNK_S, TILE_T, _prep_soa,
                                              stokeslet_apply_pallas,
                                              stresslet_apply_pallas)

def _measure_vpu_peak():
    """MEASURE the VPU slot rate with a pure elementwise chain instead of
    assuming a lane count (the round-3/4 confusion: 937.5 MHz × 1024 lanes
    = 0.96e12 slots/s sat ~4× UNDER clean measurements — consistent with
    multiple VPU ALUs per lane position; the spec is not public, so
    calibrate empirically). The chain is the logistic-type recurrence
    x ← x·(c − d·x) — nonlinear, so no compiler can compose iterations —
    over a VMEM-resident Pallas block (no HBM traffic inside the loop):
    2 slots (1 mul + 1 FMA) per element per iteration. The 2K−K difference
    cancels dispatch/readback. Returns (slots_per_s, rtt_s)."""
    m_rows, m_cols = 256, 2048                           # 2 MiB f32
    m = m_rows * m_cols
    x0 = jnp.linspace(0.5, 1.5, m, dtype=jnp.float32).reshape(m_rows, m_cols)
    c = 1.000001
    d = 3e-7

    def make(k):
        assert k % 8 == 0 or k == 1

        def kern(x_ref, o_ref):
            def body(i, x):
                for _ in range(8 if k > 1 else 1):  # manual unroll (Pallas
                    x = x * (c - d * x)             # fori_loop lacks unroll=)
                return x
            o_ref[...] = jax.lax.fori_loop(0, max(k // 8, 1), body,
                                           x_ref[...])

        @jax.jit
        def go():
            y = pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct((m_rows, m_cols),
                                                     jnp.float32),
            )(x0)
            return jnp.sum(y)

        return go

    # fixed per-call overhead (dispatch + tunnel RTT + scalar readback),
    # reported for the init/step attribution tables
    t_rtt = _time_scalar(make(1))
    k = 2048
    rate, _ = _chain_rate(make, k, float(m) * 2.0)       # 2 slots/elem/iter
    return rate, t_rtt


def _calibrate_ceiling():
    """Settle the round-4 dual-issue question with op-pure chains.

    Round 4 left the roofline without a denominator: the production
    stokeslet measured 2.58-2.9 TFLOP/s, ABOVE the assumed 1.92 TFLOP/s
    "937.5 MHz × 1024 lanes × FMA" peak, and ~1.9× the logistic-chain slot
    bound, attributed to "multiple ALUs per lane position" without a
    confirming experiment (docs/roofline.md). This runs four VMEM-resident
    elementwise chains with per-step distinct constants (float reassociation
    is rounding-unsafe, so the compiler cannot compose steps):

      mul:      x ← x·c_i          1 op,  1 FLOP / elem / step
      add:      x ← x + d_i        1 op,  1 FLOP
      fma:      x ← x·c_i + d_i    1 op,  2 FLOP
      logistic: x ← x·(c − d·x)    2 ops, 3 FLOP  (mul + FMA, dependent)

    If ops/s(fma) ≈ ops/s(mul) and logistic runs at half that, issue is
    single-slot and the FLOP ceiling is 2 × the FMA op rate. If the
    logistic chain's op rate EXCEEDS the pure chains', the mul and FMA
    co-issue (dual-issue confirmed) and the ceiling is the measured
    co-issued FLOP rate. Returns a dict incl. vpu_ceiling_tflops — the
    max sustained FLOP/s across chains — which bench.py uses as the MFU
    denominator (persisted to docs/bench_records/vpu_ceiling.json).

    First chip run post-mortem (r5b/calibrate attempt 1): the 1-op chains
    at k=2048 produce ~1 ms marginals — BELOW the tunneled backend's
    multi-ms jitter — so mul/add clamped to the 1e-12 floor (5e20 "ops/s")
    and every spread tripped the validity gate, leaving ceiling=0.0. And
    dependent x←f(x) chains measure the serial-issue rate, not throughput:
    the production stokeslet (independent work across its 9-component
    accumulator) sustained 2.76 TFLOP/s, 2.2× the dependent-FMA "ceiling".
    Fix: (a) per-chain depth sized for ≥10 ms marginals, (b) median of 3
    (dt1, dt2) pairs, (c) INDEPENDENT multi-stream FMA chains (2/4 parallel
    recurrences) that expose the instruction-level parallelism real kernels
    have — the ceiling is the max sustained rate over all valid chains."""
    m_rows, m_cols = 128, 2048                           # 1 MiB f32
    m = m_rows * m_cols
    x0 = jnp.linspace(0.5, 1.5, m, dtype=jnp.float32).reshape(m_rows, m_cols)
    # RUNTIME multiplier/addend arrays: constant-coefficient chains got
    # constant-folded (the first calibrate run measured mul at 5e20 ops/s —
    # flagged invalid by the spread gate); y ~ 1, z ~ 0 keep x in range,
    # and folding (x∘y)∘y would need float reassociation of runtime values,
    # which no compiler performs
    y0 = (1.0 + 1e-7 * jnp.cos(jnp.linspace(0, 7, m, dtype=jnp.float32))
          ).reshape(m_rows, m_cols)
    z0 = (1e-7 * jnp.sin(jnp.linspace(0, 5, m, dtype=jnp.float32))
          ).reshape(m_rows, m_cols)

    def chain(update, streams, k):
        """Rate of `streams` independent x←update(x,y,z) recurrences run
        k steps over the whole block. Returns (elem-steps/s per stream
        summed over streams, relative spread of the pair differences)."""
        def make(kk):
            assert kk % 8 == 0 or kk == 1

            def kern(x_ref, y_ref, z_ref, o_ref):
                y, z = y_ref[...], z_ref[...]
                xs0 = tuple(x_ref[...] + jnp.float32(0.01 * s)
                            for s in range(streams))

                def body(i, xs):
                    for _ in range(8 if kk > 1 else 1):
                        xs = tuple(update(x, y, z) for x in xs)
                    return xs
                xs = jax.lax.fori_loop(0, max(kk // 8, 1), body, xs0)
                acc = xs[0]
                for x in xs[1:]:
                    acc = acc + x
                o_ref[...] = acc

            @jax.jit
            def go():
                out = pl.pallas_call(
                    kern, out_shape=jax.ShapeDtypeStruct(
                        (m_rows, m_cols), jnp.float32))(x0, y0, z0)
                return jnp.sum(out)

            return go

        f1, f2 = make(k), make(2 * k)
        float(f1()), float(f2())                         # compile + warm
        pairs = []
        for _ in range(3):
            t0 = time.perf_counter(); float(f1())
            t1 = time.perf_counter(); float(f2())
            t2 = time.perf_counter()
            pairs.append((t2 - t1) - (t1 - t0))          # device time of k steps
        pairs.sort()
        marg = pairs[1] / k                              # median, per step
        lo, hi = max(pairs[0], 1e-12), pairs[2]
        spread = (hi - lo) / max(pairs[1], 1e-12)
        if pairs[1] < 5e-3:                              # below noise floor
            return None, spread
        return float(m) * streams / marg, spread

    out = {}
    # name: (update, streams, k, flops_per_elem_step)
    chains = {
        "mul": (lambda x, y, z: x * y, 1, 65536, 1.0),
        "add": (lambda x, y, z: x + z, 1, 65536, 1.0),
        "fma": (lambda x, y, z: x * y + z, 1, 32768, 2.0),
        "fma2": (lambda x, y, z: x * y + z, 2, 16384, 2.0),
        "fma4": (lambda x, y, z: x * y + z, 4, 8192, 2.0),
        "logistic": (lambda x, y, z: x * (y - z * x), 1, 16384, 3.0),
    }
    best_tflops = 0.0
    for name, (upd, streams, k, flops) in chains.items():
        r, spread = chain(upd, streams, k)
        if r is None:
            out[name + "_elemops_per_s"] = None
            out[name + "_repeat_spread"] = round(spread, 3)
            continue
        out[name + "_elemops_per_s"] = round(r, 0)
        out[name + "_tflops"] = round(r * flops / 1e12, 3)
        out[name + "_repeat_spread"] = round(spread, 3)
        if spread < 0.25:
            best_tflops = max(best_tflops, r * flops / 1e12)
    # dual-issue verdict: fma4 runs 4 INDEPENDENT FMA recurrences — if its
    # aggregate rate exceeds the dependent chain's, the VPU issues multiple
    # elementwise ops per lane per cycle (multi-ALU / pipelined issue)
    fm = out.get("fma_elemops_per_s") or 0
    fm4 = out.get("fma4_elemops_per_s") or 0
    out["dual_issue_ratio"] = round(fm4 / fm, 3) if fm else None
    out["dual_issue_confirmed"] = bool(fm and fm4 > 1.3 * fm)
    # executed-SLOT issue ceiling: max ops/s over valid chains. This is
    # bench.py's MFU denominator — nominal-flop TFLOP/s can legitimately
    # exceed the hardware-FLOP ceiling (CSE + FMA fusion execute fewer ops
    # than the 30-flops/pair accounting), so MFU is defined in executed
    # slots: (pairs/s x measured slots/pair) / slot ceiling.
    valid_rates = [out[n + "_elemops_per_s"] for n in chains
                   if out.get(n + "_elemops_per_s")
                   and out.get(n + "_repeat_spread", 1.0) < 0.25]
    out["slot_ceiling_ops_per_s"] = round(max(valid_rates), 0) if valid_rates else None
    out["vpu_ceiling_tflops"] = round(best_tflops, 3)
    out["method"] = ("max sustained FLOP/s over VMEM-resident chains "
                     "(mul/add/fma dependent; fma2/fma4 independent "
                     "streams; logistic), 2K-K differenced, median of 3 "
                     "pairs, FMA=2 FLOP")
    return out


def _stokeslet_variant(variant, src_ref, f_ref, trg_ref, out_ref):
    S = src_ref.shape[1]
    n_chunks = S // CHUNK_S
    tx = trg_ref[0:1, :].T
    ty = trg_ref[1:2, :].T
    tz = trg_ref[2:3, :].T

    def body(c, acc):
        ux, uy, uz = acc
        sl = pl.ds(c * jnp.int32(CHUNK_S), CHUNK_S)
        sx = src_ref[0:1, sl]
        sy = src_ref[1:2, sl]
        sz = src_ref[2:3, sl]
        fx = f_ref[0:1, sl]
        fy = f_ref[1:2, sl]
        fz = f_ref[2:3, sl]
        dx = tx - sx
        dy = ty - sy
        dz = tz - sz
        r2 = dx * dx + dy * dy + dz * dz
        if variant == "full":
            rinv = jnp.where(r2 > 0.0, jax.lax.rsqrt(r2), 0.0)
        elif variant == "noselect":
            rinv = jax.lax.rsqrt(r2)
        elif variant == "norsqrt":
            rinv = r2 * 0.5
        else:
            raise ValueError(variant)
        dfr2 = (dx * fx + dy * fy + dz * fz) * (rinv * rinv)
        ux = ux + jnp.sum((fx + dfr2 * dx) * rinv, axis=1, keepdims=True)
        uy = uy + jnp.sum((fy + dfr2 * dy) * rinv, axis=1, keepdims=True)
        uz = uz + jnp.sum((fz + dfr2 * dz) * rinv, axis=1, keepdims=True)
        return ux, uy, uz

    zero = jnp.zeros((trg_ref.shape[1], 1), jnp.float32)
    ux, uy, uz = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_chunks), body,
                                   (zero, zero, zero))
    out_ref[0:1, :] = ux.T
    out_ref[1:2, :] = uy.T
    out_ref[2:3, :] = uz.T


def _stresslet_variant(variant, src_ref, s_ref, trg_ref, out_ref):
    S = src_ref.shape[1]
    n_chunks = S // CHUNK_S
    tx = trg_ref[0:1, :].T
    ty = trg_ref[1:2, :].T
    tz = trg_ref[2:3, :].T

    def body(c, acc):
        ux, uy, uz = acc
        sl = pl.ds(c * jnp.int32(CHUNK_S), CHUNK_S)
        sx = src_ref[0:1, sl]
        sy = src_ref[1:2, sl]
        sz = src_ref[2:3, sl]
        dx = tx - sx
        dy = ty - sy
        dz = tz - sz
        r2 = dx * dx + dy * dy + dz * dz
        if variant == "stresslet_single_select":     # the round-3 form
            rinv = jnp.where(r2 > 0.0, jax.lax.rsqrt(r2), 0.0)
        elif variant == "stresslet_double_where":    # the pre-r3 form
            nonzero = r2 > 0.0
            rinv = jnp.where(nonzero,
                             jax.lax.rsqrt(jnp.where(nonzero, r2, 1.0)), 0.0)
        else:
            raise ValueError(variant)
        rinv2 = rinv * rinv
        rinv5 = rinv2 * rinv2 * rinv
        sxx = s_ref[0:1, sl]; sxy = s_ref[1:2, sl]; sxz = s_ref[2:3, sl]
        syx = s_ref[3:4, sl]; syy = s_ref[4:5, sl]; syz = s_ref[5:6, sl]
        szx = s_ref[6:7, sl]; szy = s_ref[7:8, sl]; szz = s_ref[8:9, sl]
        dsd = (sxx * dx * dx + syy * dy * dy + szz * dz * dz
               + (sxy + syx) * dx * dy
               + (sxz + szx) * dx * dz
               + (syz + szy) * dy * dz)
        coeff = -3.0 * dsd * rinv5
        ux = ux + jnp.sum(coeff * dx, axis=1, keepdims=True)
        uy = uy + jnp.sum(coeff * dy, axis=1, keepdims=True)
        uz = uz + jnp.sum(coeff * dz, axis=1, keepdims=True)
        return ux, uy, uz

    zero = jnp.zeros((trg_ref.shape[1], 1), jnp.float32)
    ux, uy, uz = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_chunks), body,
                                   (zero, zero, zero))
    out_ref[0:1, :] = ux.T
    out_ref[1:2, :] = uy.T
    out_ref[2:3, :] = uz.T


@functools.partial(jax.jit, static_argnames=("variant", "reps", "kind"))
def _run(variant, src, payload, trg, reps=8, kind="stokeslet"):
    with jax.enable_x64(False):
        # reduce to ONE scalar so the caller's float() readback forces the
        # whole chain to execute (block_until_ready alone measures only
        # dispatch on remote/tunneled backends — the round-3 failure mode)
        return jnp.sum(_run_inner(variant, src, payload, trg, reps, kind))


def _run_inner(variant, src, payload, trg, reps, kind):
    n = trg.shape[1]
    kern = (functools.partial(_stokeslet_variant, variant)
            if kind == "stokeslet"
            else functools.partial(_stresslet_variant, variant))

    def apply_once(carry, _):
        # feed the previous result back at 1e-3 RELATIVE and renormalize:
        # the payload genuinely changes every rep (the round-3 1e-20
        # perturbation rounded to a no-op in f32 — see module docstring)
        u_prev = carry
        scale = jnp.float32(1e-3) / jnp.maximum(
            jnp.max(jnp.abs(u_prev)), jnp.float32(1.0))
        pc = payload + (u_prev[0:1, :n] * scale).astype(jnp.float32)
        u = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((3, n), jnp.float32),
            grid=(n // TILE_T,),
            in_specs=[
                pl.BlockSpec(src.shape, lambda i: (0, 0)),
                pl.BlockSpec(payload.shape, lambda i: (0, 0)),
                pl.BlockSpec((3, TILE_T), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((3, TILE_T), lambda i: (0, i)),
        )(src, pc, trg)
        return u, None

    u, _ = jax.lax.scan(apply_once, jnp.zeros((3, n), jnp.float32),
                        None, length=reps)
    return u


def _time_scalar(fn):
    """Seconds per call of a jitted scalar-returning thunk, forcing a host
    readback of the fresh result every call (float() on a NEW scalar each
    time — a cached .item() on a reused array measures nothing)."""
    s = float(fn())  # compile + warm
    assert np.isfinite(s), "non-finite chain result"
    t0 = time.perf_counter()
    for _ in range(3):
        float(fn())
    return (time.perf_counter() - t0) / 3


def _chain_rate(make_fn, reps, pairs_per_rep):
    """Pairs/s from the DIFFERENCE of a 2K-deep and a K-deep chain: fixed
    per-call overhead (remote dispatch, tunnel RTT, scalar readback) is
    identical in both and cancels, leaving K chained applications of pure
    device time. Returns (rate, dt_marginal_per_rep)."""
    dt1 = _time_scalar(make_fn(reps))
    dt2 = _time_scalar(make_fn(2 * reps))
    marginal = max(dt2 - dt1, 1e-12) / reps
    return pairs_per_rep / marginal, marginal


def main():
    if "--calibrate" in sys.argv[1:]:
        out = _calibrate_ceiling()
        print(json.dumps(out))
        rec_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "bench_records")
        os.makedirs(rec_dir, exist_ok=True)
        with open(os.path.join(rec_dir, "vpu_ceiling.json"), "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"ceiling record -> {rec_dir}/vpu_ceiling.json",
              file=sys.stderr)
        return
    n = 8192
    # chain depth: the K and 2K marginals must dwarf the ~25 ms per-call
    # overhead's run-to-run noise (K=8 gave ~5 ms marginals → ~20% noise
    # and rate inversions between variants; K=64 gives ~40 ms marginals)
    reps = 64
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (n, 3))
    frc = rng.normal(size=(n, 3))
    S9 = rng.normal(size=(n, 9))
    src = _prep_soa(jnp.asarray(pts), n)
    f = _prep_soa(jnp.asarray(frc), n)
    s9 = _prep_soa(jnp.asarray(S9), n)
    # distinct target cloud: the unguarded timing variants (noselect /
    # norsqrt) would hit rsqrt(0)=inf on exact self-pairs, and the scalar
    # readback now ASSERTS finiteness (that assertion is the elision guard)
    trg = _prep_soa(jnp.asarray(pts + 0.0137), n)

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    slots_per_s, rtt_s = _measure_vpu_peak()
    print(f"measured VPU slot rate: {slots_per_s:.3e} slots/s "
          f"(per-call overhead {rtt_s*1e3:.1f} ms)", file=sys.stderr)
    out = {"n": n, "reps": reps, "device": str(dev),
           "slots_per_s_measured": round(slots_per_s, 0),
           "per_call_overhead_s": round(rtt_s, 5)}

    # cross-check row: the production wrapper in a dependency chain (the
    # same methodology as bench.py's headline, via the 2K−K difference)
    r = jnp.asarray(pts, jnp.float32)
    fr = jnp.asarray(frc, jnp.float32)

    def make_prod(k):
        @jax.jit
        def go():
            def body(i, u):
                return stokeslet_apply_pallas(r, 1e-3 * u + fr, r)
            return jnp.sum(jax.lax.fori_loop(0, k, body, fr))
        return go

    _, pm_a = _chain_rate(make_prod, 64, float(n) * n)
    _, pm_b = _chain_rate(make_prod, 64, float(n) * n)
    out["production_pairs_per_s"] = round(float(n) * n * 2.0
                                          / (pm_a + pm_b), 0)
    out["production_repeat_spread"] = round(
        abs(pm_a - pm_b) * 2.0 / (pm_a + pm_b), 3)

    valid = True
    rows = [("stokeslet", "full", f), ("stokeslet", "noselect", f),
            ("stokeslet", "norsqrt", f),
            ("stresslet", "stresslet_single_select", s9),
            ("stresslet", "stresslet_double_where", s9)]
    for kind, variant, payload in rows:
        def make_variant(k, kind=kind, variant=variant, payload=payload):
            return lambda: _run(variant, src, payload, trg, reps=k, kind=kind)

        # validity = REPRODUCIBILITY of the marginal, not an analytic slot
        # bound: the r4 chip measurements proved the 23-slot budget itself
        # over-counts (FMA fusion) and the "937.5 MHz × 1024 lanes" peak
        # undershoots the hardware — so a bound check cannot gate validity.
        # An elided chain shows up as a near-zero or irreproducible margin.
        rate_a, marg_a = _chain_rate(make_variant, reps, float(n) * n)
        rate_b, marg_b = _chain_rate(make_variant, reps, float(n) * n)
        marginal = 0.5 * (marg_a + marg_b)
        spread = abs(marg_a - marg_b) / marginal
        out[variant + "_s"] = round(marginal, 6)
        out[variant + "_pairs_per_s"] = round(float(n) * n / marginal, 0)
        out[variant + "_repeat_spread"] = round(spread, 3)
        out[variant + "_slots_per_pair_measured"] = round(
            slots_per_s * marginal / (float(n) * n), 2)
        if spread > 0.15 or marginal < 1e-5:
            valid = False
    out["measurement_valid"] = valid
    if valid:
        # prices as TIME per pair (ps/pair) — the *_s rows are marginal
        # seconds per ONE n×n application
        ps = 1e12 / (float(n) * n)
        out["select_ps_per_pair"] = round(
            (out["full_s"] - out["noselect_s"]) * ps, 3)
        out["rsqrt_ps_per_pair"] = round(
            (out["noselect_s"] - out["norsqrt_s"]) * ps, 3)
        out["stresslet_select_ab_ps_per_pair"] = round(
            (out["stresslet_double_where_s"]
             - out["stresslet_single_select_s"]) * ps, 3)
    else:
        out["note"] = ("a marginal failed the repeat-stability gate: "
                       "prices withheld (an elided chain shows up as a "
                       "near-zero or irreproducible margin)")
    print(json.dumps(out))
    # persist for bench.py's slot-based MFU (slots/pair numerator) — only
    # when the run passed its own validity gate
    if valid:
        rec_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "bench_records")
        os.makedirs(rec_dir, exist_ok=True)
        with open(os.path.join(rec_dir, "vpu_ops_latest.json"), "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"ops record -> {rec_dir}/vpu_ops_latest.json",
              file=sys.stderr)


if __name__ == "__main__":
    main()
