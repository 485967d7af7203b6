#!/usr/bin/env python3
"""Quantify the stokeslet kernel's true VPU slot cost (VERDICT r2 weak #2).

The headline MFU divides measured flops/s by the 1.92 TFLOP/s VPU peak with
a 23-flop/pair numerator that ignores rsqrt and the two select ops. This
microbench times kernel VARIANTS that differ by exactly one instruction
class, on the real chip, to price each class in VPU slots:

  full     — the production kernel (rsqrt + selects)
  noselect — rsqrt without the r²>0 guards
  norsqrt  — arithmetic identical except rsqrt→multiply

slots/pair(class) = Δtime × peak_lanes. Prints one JSON line.
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

from skellysim_tpu.kernels.pallas_tpu import CHUNK_S, TILE_T, _prep_soa


def _kernel(variant, src_ref, f_ref, trg_ref, out_ref):
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
            nonzero = r2 > 0.0
            rinv = jnp.where(nonzero,
                             jax.lax.rsqrt(jnp.where(nonzero, r2, 1.0)), 0.0)
        elif variant == "noselect":
            rinv = jax.lax.rsqrt(r2)
        elif variant == "norsqrt":
            rinv = r2 * 0.5
        else:
            raise ValueError(variant)
        rinv3 = rinv * rinv * rinv
        df3 = (dx * fx + dy * fy + dz * fz) * rinv3
        ux = ux + jnp.sum(fx * rinv + df3 * dx, axis=1, keepdims=True)
        uy = uy + jnp.sum(fy * rinv + df3 * dy, axis=1, keepdims=True)
        uz = uz + jnp.sum(fz * rinv + df3 * dz, axis=1, keepdims=True)
        return ux, uy, uz

    zero = jnp.zeros((trg_ref.shape[1], 1), jnp.float32)
    ux, uy, uz = jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_chunks), body,
                                   (zero, zero, zero))
    out_ref[0:1, :] = ux.T
    out_ref[1:2, :] = uy.T
    out_ref[2:3, :] = uz.T


@functools.partial(jax.jit, static_argnames=("variant", "reps"))
def _run(variant, src, f, trg, reps=8):
    # x64 mode (the repo default) makes the BlockSpec index maps return
    # i64 pairs that Mosaic cannot legalize — trace with x64 off, exactly
    # like the production wrappers (pallas_tpu.py:147)
    with jax.enable_x64(False):
        return _run_inner(variant, src, f, trg, reps)


def _run_inner(variant, src, f, trg, reps):
    n = trg.shape[1]
    kern = functools.partial(_kernel, variant)

    def apply_once(carry, _):
        # perturb the forces so XLA can't CSE the chained applies
        fc = f + carry[0:1, :n].astype(jnp.float32) * 1e-20
        u = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((3, n), jnp.float32),
            grid=(n // TILE_T,),
            in_specs=[
                pl.BlockSpec(src.shape, lambda i: (0, 0)),
                pl.BlockSpec(f.shape, lambda i: (0, 0)),
                pl.BlockSpec((3, TILE_T), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((3, TILE_T), lambda i: (0, i)),
        )(src, fc, trg)
        return u, None

    u, _ = jax.lax.scan(apply_once, jnp.zeros((3, n), jnp.float32),
                        None, length=reps)
    return u


def main():
    n = 8192
    reps = 8
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (n, 3))
    frc = rng.normal(size=(n, 3))
    src = _prep_soa(jnp.asarray(pts), n)
    f = _prep_soa(jnp.asarray(frc), n)
    trg = src

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    out = {"n": n, "reps": reps, "device": str(dev)}
    pairs = n * n * reps
    for variant in ("full", "noselect", "norsqrt"):
        u = _run(variant, src, f, trg, reps=reps)
        jax.block_until_ready(u)
        t0 = time.perf_counter()
        for _ in range(3):
            u = _run(variant, src, f, trg, reps=reps)
        jax.block_until_ready(u)
        dt = (time.perf_counter() - t0) / 3
        out[variant + "_s"] = round(dt, 5)
        out[variant + "_pairs_per_s"] = round(pairs / dt, 0)
    # slot pricing at the assumed peak (lanes × clock): 1.92 TFLOP/s → 0.96
    # T slot/s (every slot is a potential FMA = 2 flops)
    slots_per_s = 0.96e12
    out["select_slots_per_pair"] = round(
        (out["full_s"] - out["noselect_s"]) / pairs * slots_per_s, 2)
    out["rsqrt_slots_per_pair"] = round(
        (out["noselect_s"] - out["norsqrt_s"]) / pairs * slots_per_s, 2)
    out["total_slots_per_pair_full"] = round(
        out["full_s"] / pairs * slots_per_s, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
