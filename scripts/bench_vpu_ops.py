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
  * feeds back at 1e-3 relative (result genuinely changes per rep, then
    rescales) so no stage can be skipped,
  * times the PRODUCTION wrapper with the same chained-loop methodology
    as a cross-check row,
  * REFUSES to report slot prices when any measured rate exceeds the
    analytic slot bound (prints measurement_valid=false instead),
  * A/Bs the stresslet's round-3 select change (single-select vs the
    original double-where) to settle the 63.0→60.3 MFU regression.

Prints one JSON line. See docs/roofline.md for the slot budgets.
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

_SLOTS_PER_S = 0.96e12   # 940 MHz × 1024 lanes (each slot = 1 op ≤ 2 flops)
# analytic slot budgets (docs/roofline.md): ops per pair in the inner loop
_SLOTS = {"full": 23.0, "noselect": 22.0, "norsqrt": 21.0,
          "stresslet_single_select": 32.0, "stresslet_double_where": 33.0}


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
        return _run_inner(variant, src, payload, trg, reps, kind)


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


def _time(fn, *args, **kw):
    u = fn(*args, **kw)
    jax.block_until_ready(u)
    t0 = time.perf_counter()
    for _ in range(3):
        u = fn(*args, **kw)
    jax.block_until_ready(u)
    return (time.perf_counter() - t0) / 3


def main():
    n = 8192
    reps = 8
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (n, 3))
    frc = rng.normal(size=(n, 3))
    S9 = rng.normal(size=(n, 9))
    src = _prep_soa(jnp.asarray(pts), n)
    f = _prep_soa(jnp.asarray(frc), n)
    s9 = _prep_soa(jnp.asarray(S9), n)
    trg = src

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    out = {"n": n, "reps": reps, "device": str(dev),
           "slots_per_s_assumed": _SLOTS_PER_S}
    pairs = float(n) * n * reps

    # cross-check row: the production wrapper, chained via host loop
    r = jnp.asarray(pts)
    fr = jnp.asarray(frc)
    dt_prod = _time(lambda: stokeslet_apply_pallas(r, fr, r))
    out["production_pairs_per_s"] = round(n * n / dt_prod, 0)

    valid = True
    rows = [("stokeslet", "full", f), ("stokeslet", "noselect", f),
            ("stokeslet", "norsqrt", f),
            ("stresslet", "stresslet_single_select", s9),
            ("stresslet", "stresslet_double_where", s9)]
    for kind, variant, payload in rows:
        dt = _time(_run, variant, src, payload, trg, reps=reps, kind=kind)
        rate = pairs / dt
        bound = _SLOTS_PER_S / _SLOTS[variant]
        out[variant + "_s"] = round(dt, 5)
        out[variant + "_pairs_per_s"] = round(rate, 0)
        out[variant + "_slots_per_pair_measured"] = round(
            _SLOTS_PER_S / rate, 2)
        if rate > 1.05 * bound:
            valid = False
    out["measurement_valid"] = valid
    if valid:
        out["select_slots_per_pair"] = round(
            (out["full_s"] - out["noselect_s"]) / pairs * _SLOTS_PER_S, 2)
        out["rsqrt_slots_per_pair"] = round(
            (out["noselect_s"] - out["norsqrt_s"]) / pairs * _SLOTS_PER_S, 2)
    else:
        out["note"] = ("a measured rate exceeds the analytic slot bound: "
                       "the chain is being elided — prices withheld "
                       "(this is what invalidated the round-3 numbers)")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
