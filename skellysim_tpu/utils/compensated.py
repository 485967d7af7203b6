"""Compensated (double-word) floating-point primitives for the TPU.

The TPU compiler rejects f64, so the tight-tolerance regime the reference
reaches with double precision (gmres_tol 1e-10, src/core/params.cpp:14) is
emulated where it matters: error-free transforms (2Sum, Veltkamp/Dekker
2Prod) represent a value as an (hi, lo) pair of working-precision floats
carrying ~2× the mantissa bits. Everything here is branch-free elementwise
VPU work — no data-dependent control flow, fully jit/vmap compatible, and
dtype-generic (f32 pairs on TPU ≈ f64; f64 pairs on CPU ≈ quad).

Used by the increment-form fiber solve (fd_fiber.residual_delta): the
β/dt-scaled terms of the implicit operator cancel against the RHS at the
working precision's resolution, so the residual of the previous state —
the quantity that sets per-step position accuracy — is computed with
two_prod/two_sum instead of naive rounding. See solver/gmres.py for the
compensated dot/norm used in the solver itself.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def two_sum(a, b):
    """Error-free addition: a + b = s + e exactly (Knuth 2Sum, 6 flops,
    no branch, valid for any ordering of |a|, |b|)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free addition assuming |a| ≥ |b| (Dekker Fast2Sum, 3 flops)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _splitter(dtype):
    # Veltkamp splitter 2^ceil(p/2)+1: f32 p=24 → 2^12+1; f64 p=53 → 2^27+1
    return 4097.0 if jnp.dtype(dtype) == jnp.float32 else 134217729.0


def split(a):
    """Veltkamp split: a = hi + lo with hi, lo each on ~p/2 mantissa bits
    (so products of two halves are exact)."""
    c = _splitter(a.dtype) * a
    hi = c - (c - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Error-free multiplication: a * b = p + e exactly (Dekker, via
    Veltkamp splits — no FMA dependence, which XLA does not expose)."""
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# ---- double-word vectors: (hi, lo) pairs of same-shape arrays ----

def dd_add(x, y):
    """(hi, lo) + (hi, lo) → normalized (hi, lo).

    The final normalization uses full two_sum, NOT fast_two_sum: after
    cancellation (xh ≈ −yh) the carried error e+(xl+yl) can exceed |s|,
    violating Fast2Sum's ordering precondition and silently dropping bits.
    """
    xh, xl = x
    yh, yl = y
    s, e = two_sum(xh, yh)
    return two_sum(s, e + (xl + yl))


def dd_add_f(x, b):
    """(hi, lo) + plain float array."""
    xh, xl = x
    s, e = two_sum(xh, b)
    return two_sum(s, e + xl)


def dd_neg(x):
    return -x[0], -x[1]


def dd_mul_ff(a, b):
    """plain × plain → (hi, lo), exact."""
    return two_prod(a, b)


def dd_mul(x, y):
    """(hi, lo) × (hi, lo) → (hi, lo) (relative error ~2^-2p)."""
    xh, xl = x
    yh, yl = y
    p, e = two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    return fast_two_sum(p, e)


def dd_from(a):
    return a, jnp.zeros_like(a)


def dd_to(x):
    """Collapse to working precision (callers use this when the dd value is
    small enough that a single float carries it, e.g. a residual)."""
    return x[0] + x[1]


def dd_sum(x, axis):
    """Compensated reduction of a dd array along ``axis`` via a pairwise
    tree of dd_add — error O(log n · 2^-2p), fully vectorized."""
    h, l = x
    n = h.shape[axis]
    h = jnp.moveaxis(h, axis, 0)
    l = jnp.moveaxis(l, axis, 0)
    while h.shape[0] > 1:
        m = h.shape[0]
        if m % 2:
            h = jnp.concatenate([h, jnp.zeros_like(h[:1])], axis=0)
            l = jnp.concatenate([l, jnp.zeros_like(l[:1])], axis=0)
            m += 1
        (h, l) = dd_add((h[0::2], l[0::2]), (h[1::2], l[1::2]))
    return h[0], l[0]


def dd_matvec_f32exact(M, x, x_lo=None):
    """dd product M @ x of plain-float operands: (..., m, n) @ (..., n)
    → dd (..., m). Products are error-free (two_prod); the reduction is a
    compensated pairwise tree, so the result is the EXACT matvec of the
    stored (already-rounded) operands to ~2^-2p. Optional ``x_lo`` carries
    a dd x (its product with M is accumulated in plain precision — it is
    already ~2^-p small).
    """
    p, e = two_prod(M, x[..., None, :])
    if x_lo is not None:
        e = e + M * x_lo[..., None, :]
    return dd_sum((p, e), axis=-1)


def dd_matvec(M, x, M_lo=None, x_lo=None):
    """dd product M @ x where BOTH operands may carry low parts:
    (..., m, n) @ (..., n) → dd (..., m).

    The hi×hi products are error-free (two_prod); the hi×lo cross terms are
    accumulated in plain precision (they are already ~2^-p small); lo×lo is
    dropped (~2^-2p). With ``M_lo`` from a f64 host matrix split into f32
    (hi, lo), the result is the f64-accurate matvec — this is what lets the
    emulated-precision fiber residual apply the high-order finite-difference
    operators (whose row sums cancel ~4 orders for smooth data) without the
    cancellation amplifying f32 entry rounding.
    """
    p, e = two_prod(M, x[..., None, :])
    if x_lo is not None:
        e = e + M * x_lo[..., None, :]
    if M_lo is not None:
        e = e + M_lo * x[..., None, :]
    return dd_sum((p, e), axis=-1)


def dd_scale(x, a):
    """dd vector × plain scalar/array → dd (error-free hi product)."""
    xh, xl = x
    p, e = two_prod(xh, a)
    return fast_two_sum(p, e + xl * a)


def accurate_log(x):
    """Elementwise natural log, ~1-ulp accurate in the input dtype.

    The TPU's f32 `log` primitive is only ~4e-6-accurate (measured
    3.848e-6 relative on v5e — enough to bias SBT drag coefficients, and
    through them every fiber velocity, at exactly that level). This builds
    log from exact VPU arithmetic: x = m·2^k (frexp), m normalized into
    [√2/2, √2), then 2·atanh((m−1)/(m+1)) by series (|t| ≤ 0.1716 → the
    t¹¹ truncation term is < 4e-10) plus k·ln2 accumulated as a split
    high/low constant product.
    """
    if jnp.dtype(jnp.result_type(x)) == jnp.float64:
        # f64 log is already ~1 ulp on CPU, and the f64 frexp path lowers
        # to an s64 bitcast the TPU X64-rewriter cannot handle (it killed
        # the driver's entry() compile check on the axon chip) — the series
        # repair below is only needed for the TPU's ~4e-6 f32 log
        return jnp.log(x)
    m, k = jnp.frexp(x)                      # m ∈ [0.5, 1)
    lo_half = m < 0.7071067811865476
    m = jnp.where(lo_half, 2.0 * m, m)       # m ∈ [√2/2, √2)
    k = jnp.where(lo_half, k - 1, k).astype(m.dtype)
    t = (m - 1.0) / (m + 1.0)
    t2 = t * t
    s = 2.0 * t * (1.0 + t2 * (1.0 / 3.0 + t2 * (1.0 / 5.0
                   + t2 * (1.0 / 7.0 + t2 * (1.0 / 9.0 + t2 / 11.0)))))
    # ln2 split so k·ln2 + s rounds once at the end
    import numpy as _np

    _ln2 = 0.6931471805599453094172321
    np_dt = _np.dtype(jnp.dtype(m.dtype).name)
    ln2_hi = jnp.asarray(_np.asarray(_ln2, np_dt), m.dtype)
    ln2_lo = jnp.asarray(_ln2 - float(_np.asarray(_ln2, np_dt)), m.dtype)
    return (k * ln2_hi + (k * ln2_lo + s))


def comp_dot(x, y):
    """Compensated dot product of plain vectors: exact products + pairwise
    compensated reduction → ~2^-2p relative error. Returns the dd pair;
    collapse with dd_to when a plain float suffices (the collapse itself
    costs the output's half-ulp, never the √n·2^-p accumulation error of a
    naive reduction)."""
    p, e = two_prod(x, y)
    return dd_sum((p, e), axis=0)


def comp_norm(x):
    """Compensated 2-norm of a plain vector (plain-float result, accurate
    to its own half-ulp)."""
    h, l = comp_dot(x, x)
    # the sum of squares is nonnegative; sqrt of the dd value via one
    # Newton step from the plain estimate
    s = jnp.sqrt(h)
    safe = jnp.where(s > 0, s, 1.0)
    return jnp.where(s > 0, s + (h - s * s + l) / (2.0 * safe), 0.0)
