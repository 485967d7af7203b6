"""Pallas cell-pair near-field kernel for the spectral-Ewald tier.

The screened near field is a cell-list sum: sources bin into r_cut-sized
cells and each target interacts with its 27-cell neighborhood
(kernels/ewald.py `_near_apply`). Evaluated as XLA elementwise ops that sum
runs at ~2% of the Pallas pairwise throughput (round-1 profile,
docs/farfield_plan.md) — it dominated the oocyte-scale Ewald step. This
module moves the pair work onto the VPU with the same tiling discipline as
the dense kernels (kernels/pallas_tpu.py):

  * both sides are binned into fixed-capacity PER-CELL stores laid out
    structure-of-arrays — (cell, 3, cap) with cap on lanes — so every op in
    the kernel is a full-width (CAP_T, CAP_S) vector op;
  * the kernel grid is (target_cell, 27): a scalar-prefetched neighbor
    table drives the source-block index map (`PrefetchScalarGridSpec`), so
    the pipeline DMAs exactly the 27 neighbor stores each target cell
    needs; the output block index depends only on the target cell, so the
    accumulator never leaves VMEM across the 27 inner steps;
  * erfc comes from the Abramowitz–Stegun 7.1.26 rational form, which
    reuses the e^{−ρ²} the screened coefficients need anyway (|ε| ≤ 1.5e-7,
    well under the f32 evaluator class).

Binning is captured in a reusable NearPlan: it depends only on POSITIONS,
which are fixed for a whole timestep, so the System builds each plan once
per step and shares it across every GMRES iteration and across the
stokeslet/stresslet applies of one matvec. The plan also counts the points
dropped by capacity overflow — the System surfaces the count and regrows
capacities instead of silently losing interactions (the reference's FMM has
no silent-loss mode; neither should this tier).

Reference parity target: kernels.hpp:56-134 (the FMM evaluator slot);
accuracy class matches kernel_test.cpp's FMM-vs-direct rows.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_8PI = 1.0 / (8.0 * math.pi)
_INV_4PI32 = 1.0 / (4.0 * math.pi**1.5)
_SENTINEL = 1e8   # empty-slot coordinate: ρ ≫ 1 so every screened
                  # coefficient underflows to exactly 0 in f32

# A&S 7.1.26 erfc coefficients (used with the Gaussian already in hand)
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def _erfc_as(rho, gauss):
    """erfc(ρ) ≈ poly(1/(1+pρ))·e^{−ρ²} for ρ ≥ 0 (A&S 7.1.26, |ε|<1.5e-7)."""
    t = 1.0 / (1.0 + _AS_P * rho)
    a1, a2, a3, a4, a5 = _AS_A
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return poly * gauss


class NearPlan(NamedTuple):
    """Positions-only binning state, shared across the applies of a step.

    Source side: ``src_order``/``src_idx``/``src_valid`` re-bin any payload
    with one gather; ``cell_r`` is the prebuilt position store with one
    extra all-sentinel cell at index n_cells (the clip target for
    out-of-box neighbors). Target side: ``tcell_r`` stores plus the
    gather-only inverse map (``trg_key``, ``trg_slot``). ``dropped`` is the
    total number of points lost to capacity overflow (sources + targets) —
    nonzero means the evaluation is WRONG and capacities must grow.
    """

    cell_r: jax.Array      # (n_cells+1, 3, CAP_S)
    src_order: jax.Array   # (N_s,)
    src_idx: jax.Array     # (n_cells, CAP_S) indices into sorted order
    src_valid: jax.Array   # (n_cells, CAP_S) bool
    tcell_r: jax.Array     # (n_tc, 3, CAP_T)
    nbr: jax.Array         # (n_tc, 27) int32 source-cell ids (sentinel=n_cells)
    trg_key: jax.Array     # (N_t,) target cell id
    trg_slot: jax.Array    # (N_t,) slot within the cell (≥CAP_T ⇒ dropped)
    dropped: jax.Array     # () int32 total overflow count


def _cell_keys(points, lo, cell, n_cells_xyz):
    nx, ny, nz = n_cells_xyz
    ci = jnp.clip(((points - lo[None, :]) / cell).astype(jnp.int32),
                  0, jnp.asarray([nx - 1, ny - 1, nz - 1]))
    return (ci[:, 0] * ny + ci[:, 1]) * nz + ci[:, 2]


def _bin_side(key, n_bins, cap):
    """Sort/searchsorted binning (scatter-free). Returns (order, idx, valid,
    starts, dropped)."""
    n = key.shape[0]
    order = jnp.argsort(key)
    key_s = key[order]
    bounds = jnp.searchsorted(key_s, jnp.arange(n_bins + 1, dtype=key.dtype))
    starts, ends = bounds[:-1], bounds[1:]
    counts = ends - starts
    dropped = jnp.sum(jnp.maximum(counts - cap, 0))
    slot = jnp.arange(cap, dtype=starts.dtype)
    idx = starts[:, None] + slot[None, :]
    valid = idx < ends[:, None]
    idx = jnp.clip(idx, 0, n - 1)
    return order, idx, valid, starts, dropped.astype(jnp.int32)


def neighbor_table(n_cells_xyz) -> jax.Array:
    """(n_cells, 27) int32 neighbor ids; out-of-box offsets AND clip
    duplicates map to the sentinel empty cell (id n_cells)."""
    nx, ny, nz = n_cells_xyz
    n_cells = nx * ny * nz
    cid = jnp.arange(n_cells, dtype=jnp.int32)
    ci = jnp.stack([cid // (ny * nz), (cid // nz) % ny, cid % nz], axis=1)
    offs = jnp.asarray([(dx, dy, dz) for dx in (-1, 0, 1)
                        for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
                       jnp.int32)                          # (27, 3)
    nb = ci[:, None, :] + offs[None, :, :]                 # (n_cells, 27, 3)
    lim = jnp.asarray([nx, ny, nz], jnp.int32)
    ok = jnp.all((nb >= 0) & (nb < lim[None, None, :]), axis=-1)
    ids = (nb[..., 0] * ny + nb[..., 1]) * nz + nb[..., 2]
    return jnp.where(ok, ids, n_cells).astype(jnp.int32)


@partial(jax.jit, static_argnames=("n_cells_xyz", "cap_s", "cap_t"))
def make_plan(r_src, r_trg, lo, cell, n_cells_xyz, cap_s: int,
              cap_t: int) -> NearPlan:
    """Bin sources and targets into per-cell SoA stores (positions only)."""
    nx, ny, nz = n_cells_xyz
    n_cells = nx * ny * nz
    dtype = r_trg.dtype

    skey = _cell_keys(r_src, lo, cell, n_cells_xyz)
    s_order, s_idx, s_valid, _, s_drop = _bin_side(skey, n_cells, cap_s)
    r_sorted = r_src[s_order]
    cr = jnp.where(s_valid[..., None], r_sorted[s_idx],
                   jnp.asarray(_SENTINEL, dtype))          # (n_cells, CAP_S, 3)
    cell_r = jnp.concatenate(
        [cr.transpose(0, 2, 1),
         jnp.full((1, 3, cap_s), _SENTINEL, dtype)], axis=0)

    tkey = _cell_keys(r_trg, lo, cell, n_cells_xyz)
    t_order, t_idx, t_valid, t_starts, t_drop = _bin_side(tkey, n_cells, cap_t)
    tr = jnp.where(t_valid[..., None], r_trg[t_order][t_idx],
                   jnp.asarray(_SENTINEL, dtype))
    tcell_r = tr.transpose(0, 2, 1)                        # (n_cells, 3, CAP_T)
    # inverse map: target p at sorted rank s lives in (key[p], s - starts[key])
    ranks = jnp.argsort(t_order)
    slot = ranks - t_starts[tkey]

    return NearPlan(cell_r=cell_r, src_order=s_order, src_idx=s_idx,
                    src_valid=s_valid, tcell_r=tcell_r,
                    nbr=neighbor_table(n_cells_xyz), trg_key=tkey,
                    trg_slot=slot, dropped=s_drop + t_drop)


def bin_payload(plan: NearPlan, payload: jax.Array) -> jax.Array:
    """(N_s, K) per-source payload → (n_cells+1, K, CAP_S) store (zeros in
    empty slots and the sentinel cell) using the plan's source binning."""
    K = payload.shape[1]
    p = jnp.where(plan.src_valid[..., None], payload[plan.src_order][plan.src_idx],
                  0.0)                                     # (n_cells, CAP_S, K)
    cap_s = p.shape[1]
    return jnp.concatenate(
        [p.transpose(0, 2, 1),
         jnp.zeros((1, K, cap_s), p.dtype)], axis=0)


def unbin_targets(plan: NearPlan, u_cells: jax.Array) -> jax.Array:
    """(n_tc, 3, CAP_T) per-cell results → (N_t, 3) in point order.
    Overflowed targets (slot ≥ CAP_T) read garbage; they are zeroed here and
    accounted for in ``plan.dropped``."""
    cap_t = u_cells.shape[-1]
    slot_c = jnp.clip(plan.trg_slot, 0, cap_t - 1)
    u = u_cells[plan.trg_key, :, slot_c]                   # (N_t, 3)
    return jnp.where((plan.trg_slot < cap_t)[:, None], u, 0.0)


# ---- the pair-block math (shared by the Pallas kernel and the XLA oracle) --

def _stokeslet_block(tx, ty, tz, sx, sy, sz, fx, fy, fz, a: float,
                     exact_erfc: bool = False):
    """Screened-stokeslet velocity of one (CAP_T, CAP_S) cell pair.

    Targets on sublanes ((T, 1) columns), sources on lanes ((1, S) rows).
    Includes the −f_far(0) coincident-pair correction that cancels the far
    grid's self term (ewald.py `_near_apply` semantics). ``exact_erfc``
    selects lax.erfc (the f64 oracle path) over the A&S rational form (the
    f32 VPU path, where its 1.5e-7 error is below the evaluator class).
    """
    dx = tx - sx
    dy = ty - sy
    dz = tz - sz
    r2 = dx * dx + dy * dy + dz * dz
    nonzero = r2 > 0.0
    rinv = jnp.where(nonzero, jax.lax.rsqrt(jnp.where(nonzero, r2, 1.0)), 0.0)
    rho = r2 * rinv / a                                    # r/a
    gauss = jnp.exp(-rho * rho)
    erfc = jax.lax.erfc(rho) if exact_erfc else _erfc_as(rho, gauss)
    c_g = _INV_4PI32 / a
    fN = _INV_8PI * erfc * rinv - c_g * gauss
    gN = _INV_8PI * erfc * rinv + c_g * gauss
    # r = 0: cancel the far grid's f_far(0) = 1/(2π^{3/2}a) self term
    f0 = 1.0 / (2.0 * math.pi**1.5 * a)
    fN = jnp.where(nonzero, fN, -f0)
    df_r2 = (dx * fx + dy * fy + dz * fz) * (gN * rinv * rinv)
    ux = jnp.sum(fN * fx + df_r2 * dx, axis=1, keepdims=True)
    uy = jnp.sum(fN * fy + df_r2 * dy, axis=1, keepdims=True)
    uz = jnp.sum(fN * fz + df_r2 * dz, axis=1, keepdims=True)
    return ux, uy, uz


def _stresslet_block(tx, ty, tz, sx, sy, sz, s9, a: float,
                     exact_erfc: bool = False):
    """Screened-stresslet velocity of one (CAP_T, CAP_S) cell pair.
    ``s9``: tuple of 9 (1, S) rows of S_ij in row-major ij order.
    T_near(0) = 0, so no coincident correction is needed."""
    sxx, sxy, sxz, syx, syy, syz, szx, szy, szz = s9
    dx = tx - sx
    dy = ty - sy
    dz = tz - sz
    r2 = dx * dx + dy * dy + dz * dz
    nonzero = r2 > 0.0
    r2s = jnp.where(nonzero, r2, 1.0)
    rinv = jnp.where(nonzero, jax.lax.rsqrt(r2s), 0.0)
    r = r2 * rinv
    rho = r / a
    gauss = jnp.exp(-rho * rho)
    erfc = jax.lax.erfc(rho) if exact_erfc else _erfc_as(rho, gauss)
    c3 = 1.0 / (2.0 * math.pi**1.5 * a**3)
    A_r = c3 * gauss                                       # = B_r
    rinv2 = rinv * rinv
    rinv3 = rinv2 * rinv
    C_r3 = (-3.0 / (4.0 * math.pi) * erfc * rinv2
            - 3.0 / (2.0 * math.pi**1.5 * a) * gauss * rinv
            - 2.0 * c3 * r * gauss) * rinv3
    A_r = jnp.where(nonzero, A_r, 0.0)
    C_r3 = jnp.where(nonzero, C_r3, 0.0)
    tr = sxx + syy + szz
    Sd_x = sxx * dx + sxy * dy + sxz * dz
    Sd_y = syx * dx + syy * dy + syz * dz
    Sd_z = szx * dx + szy * dy + szz * dz
    Std_x = sxx * dx + syx * dy + szx * dz
    Std_y = sxy * dx + syy * dy + szy * dz
    Std_z = sxz * dx + syz * dy + szz * dz
    dSd = dx * Sd_x + dy * Sd_y + dz * Sd_z
    coefd = A_r * tr + C_r3 * dSd
    ux = jnp.sum(coefd * dx + A_r * (Sd_x + Std_x), axis=1, keepdims=True)
    uy = jnp.sum(coefd * dy + A_r * (Sd_y + Std_y), axis=1, keepdims=True)
    uz = jnp.sum(coefd * dz + A_r * (Sd_z + Std_z), axis=1, keepdims=True)
    return ux, uy, uz


# ---- Pallas kernels ----

def _near_kernel(kind: str, a: float):
    def kernel(nbr_ref, sr_ref, sf_ref, tr_ref, out_ref):
        j = pl.program_id(1)
        tx = tr_ref[0, 0:1, :].T                           # (CAP_T, 1)
        ty = tr_ref[0, 1:2, :].T
        tz = tr_ref[0, 2:3, :].T
        sx = sr_ref[0, 0:1, :]                             # (1, CAP_S)
        sy = sr_ref[0, 1:2, :]
        sz = sr_ref[0, 2:3, :]
        if kind == "stokeslet":
            ux, uy, uz = _stokeslet_block(
                tx, ty, tz, sx, sy, sz,
                sf_ref[0, 0:1, :], sf_ref[0, 1:2, :], sf_ref[0, 2:3, :], a)
        else:
            s9 = tuple(sf_ref[0, k:k + 1, :] for k in range(9))
            ux, uy, uz = _stresslet_block(tx, ty, tz, sx, sy, sz, s9, a)

        @pl.when(j == 0)
        def _():
            out_ref[0, 0:1, :] = ux.T
            out_ref[0, 1:2, :] = uy.T
            out_ref[0, 2:3, :] = uz.T

        @pl.when(j > 0)
        def _():
            out_ref[0, 0:1, :] = out_ref[0, 0:1, :] + ux.T
            out_ref[0, 1:2, :] = out_ref[0, 1:2, :] + uy.T
            out_ref[0, 2:3, :] = out_ref[0, 2:3, :] + uz.T

    return kernel


@partial(jax.jit, static_argnames=("kind", "a", "interpret"))
def _near_cells_pallas(cell_r, cell_f, tcell_r, nbr, kind: str, a: float,
                       interpret: bool = False):
    """(n_tc, 3, CAP_T) per-cell velocities via the cell-pair grid. f32."""
    n_tc = tcell_r.shape[0]
    cap_t = tcell_r.shape[2]
    cap_s = cell_r.shape[2]
    K = cell_f.shape[1]
    flops = {"stokeslet": 30, "stresslet": 60}[kind]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tc, 27),
        in_specs=[
            pl.BlockSpec((1, 3, cap_s), lambda i, j, nbr: (nbr[i, j], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, cap_s), lambda i, j, nbr: (nbr[i, j], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, cap_t), lambda i, j, nbr: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, cap_t), lambda i, j, nbr: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _near_kernel(kind, a),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tc, 3, cap_t), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops * n_tc * 27 * cap_t * cap_s,
            bytes_accessed=4 * n_tc * 27 * (3 + K) * cap_s,
            transcendentals=2 * n_tc * 27 * cap_t * cap_s,
        ),
        interpret=interpret,
    )(nbr, cell_r, cell_f, tcell_r)


def _near_cells_xla(cell_r, cell_f, tcell_r, nbr, kind: str, a: float):
    """Same cell-pair computation in plain XLA (CPU path + parity oracle)."""
    def one_cell(args):
        tr, nb = args                                      # (3, CAP_T), (27,)
        tx, ty, tz = tr[0:1, :].T, tr[1:2, :].T, tr[2:3, :].T
        srs = cell_r[nb]                                   # (27, 3, CAP_S)
        sfs = cell_f[nb]

        def body(c, acc):
            sr = srs[c]
            sf = sfs[c]
            if kind == "stokeslet":
                u = _stokeslet_block(tx, ty, tz, sr[0:1], sr[1:2], sr[2:3],
                                     sf[0:1], sf[1:2], sf[2:3], a,
                                     exact_erfc=True)
            else:
                s9 = tuple(sf[k:k + 1, :] for k in range(9))
                u = _stresslet_block(tx, ty, tz, sr[0:1], sr[1:2], sr[2:3],
                                     s9, a, exact_erfc=True)
            return tuple(x + y for x, y in zip(acc, u))

        cap_t = tr.shape[1]
        zero = jnp.zeros((cap_t, 1), tr.dtype)
        ux, uy, uz = jax.lax.fori_loop(0, 27, body, (zero, zero, zero))
        return jnp.concatenate([ux.T, uy.T, uz.T], axis=0)  # (3, CAP_T)

    return jax.lax.map(one_cell, (tcell_r, nbr))


def near_apply_plan(plan: NearPlan, payload: jax.Array, a: float,
                    kind: str = "stokeslet", use_pallas: bool = None,
                    interpret: bool = False) -> jax.Array:
    """Near-field velocities at the plan's targets from per-source payload
    ((N_s, 3) forces or (N_s, 9) row-major stresslet densities).

    Same 8π/η-free scale as ewald.py ``_near_apply``; the caller divides by
    η (stokeslet) or 2η (stresslet).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    cell_f = bin_payload(plan, payload)
    if use_pallas:
        with jax.enable_x64(False):
            u_cells = _near_cells_pallas(
                plan.cell_r.astype(jnp.float32), cell_f.astype(jnp.float32),
                plan.tcell_r.astype(jnp.float32), plan.nbr, kind, float(a),
                interpret=interpret)
        u_cells = u_cells.astype(payload.dtype)
    else:
        u_cells = _near_cells_xla(plan.cell_r, cell_f, plan.tcell_r,
                                  plan.nbr, kind, float(a))
    return unbin_targets(plan, u_cells)
