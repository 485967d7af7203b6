"""Matrix-free right-preconditioned GMRES, jit-compatible.

TPU-native replacement for the reference's Trilinos Belos
PseudoBlockGmresSolMgr with right preconditioning and ICGS orthogonalization
(src/core/solver_hydro.cpp:63-95, include/solver.hpp:10-49). Differences by
design:

  * one static Krylov buffer, `lax.while_loop` over iterations — the whole
    solve traces into a single XLA computation (no host round-trips per
    iteration, unlike Belos' C++ iteration loop)
  * orthogonalization is two-pass classical Gram-Schmidt (the "iterated CGS"
    Belos uses), expressed as matmuls against the Krylov basis so the MXU does
    the work and, under sharding, the reductions become single fused psums
  * Givens rotations maintain the running residual norm so convergence checks
    are free

When the operand vectors are sharded with jax.sharding, the dot products and
basis updates lower to ICI collectives automatically; this routine is used
unchanged on 1 chip or a mesh.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class GmresResult(NamedTuple):
    x: jax.Array
    residual: jax.Array      # final relative residual estimate
    iterations: jax.Array    # total inner iterations performed
    converged: jax.Array     # bool


class GmresCarry(NamedTuple):
    """Arnoldi state of one in-progress GMRES(m) cycle, threaded across
    host-driven program segments (see ``gmres_segment``)."""
    V: jax.Array             # (m+1, n) Krylov basis
    H: jax.Array             # (m+1, m) Givens-rotated Hessenberg
    cs: jax.Array            # (m,) Givens cosines
    sn: jax.Array            # (m,) Givens sines
    g: jax.Array             # (m+1,) rotated RHS; |g[j]| = LS residual
    j: jax.Array             # int32 inner-iteration cursor
    res: jax.Array           # current absolute LS residual |g[j]|


class GmresSegmentResult(NamedTuple):
    x: jax.Array             # current LS solution estimate (valid mid-cycle)
    residual: jax.Array      # relative residual ||b - A x|| / ||b||
    iterations: jax.Array    # inner iterations completed IN THIS CYCLE
    converged: jax.Array     # bool
    carry: GmresCarry


def _identity(x):
    return x


def _make_arnoldi_iter(matvec, M, _norm, _proj, m, dtype):
    """One preconditioned Arnoldi + Givens step over the static (m+1, n)
    basis; carry = (V, H, cs, sn, g, j, res). Shared by the one-shot
    solver and the segmented continuation."""

    def arnoldi_iter(carry):
        V, H, cs, sn, g, j, _ = carry
        w = matvec(M(V[j]))
        # two-pass classical Gram-Schmidt against the full static basis with a
        # column mask — both passes are (m+1, n) @ (n,) matmuls
        mask = (jnp.arange(m + 1) <= j).astype(dtype)
        h1 = _proj(V, w) * mask
        w = w - V.T @ h1
        h2 = _proj(V, w) * mask
        w = w - V.T @ h2
        h = h1 + h2
        w_norm = _norm(w)
        H = H.at[:, j].set(h)
        H = H.at[j + 1, j].set(w_norm)
        V = V.at[j + 1].set(jnp.where(w_norm > 0.0, w / jnp.where(w_norm > 0.0, w_norm, 1.0), w))

        # apply accumulated Givens rotations to the new column
        def apply_rot(i, col):
            t = cs[i] * col[i] + sn[i] * col[i + 1]
            col = col.at[i + 1].set(-sn[i] * col[i] + cs[i] * col[i + 1])
            return col.at[i].set(t)

        col = jax.lax.fori_loop(0, j, apply_rot, H[:, j])
        # new rotation to annihilate the subdiagonal
        denom = jnp.sqrt(col[j] ** 2 + col[j + 1] ** 2)
        c_new = jnp.where(denom > 0.0, col[j] / jnp.where(denom > 0.0, denom, 1.0), 1.0)
        s_new = jnp.where(denom > 0.0, col[j + 1] / jnp.where(denom > 0.0, denom, 1.0), 0.0)
        col = col.at[j].set(c_new * col[j] + s_new * col[j + 1]).at[j + 1].set(0.0)
        H = H.at[:, j].set(col)
        cs = cs.at[j].set(c_new)
        sn = sn.at[j].set(s_new)
        g = g.at[j + 1].set(-s_new * g[j])
        g = g.at[j].set(c_new * g[j])
        res = jnp.abs(g[j + 1])
        return V, H, cs, sn, g, j + 1, res

    return arnoldi_iter


def _ls_solution(x_base, M, V, H, g, j, m, dtype):
    """Back-substitute the j-column least-squares system and return the
    current solution estimate x_base + M(V[:m]^T y) — valid at any j."""
    idx = jnp.arange(m)
    active = idx < j
    Hm = H[:m, :m] + jnp.diag(jnp.where(active, 0.0, 1.0).astype(dtype))
    gm = jnp.where(active, g[:m], 0.0)
    y = jax.scipy.linalg.solve_triangular(Hm, gm, lower=False)
    y = jnp.where(active, y, 0.0)
    return x_base + M(V[:m].T @ y)


@functools.partial(jax.jit, static_argnames=("matvec", "precond", "restart",
                                             "max_restarts", "compensated"))
def gmres(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    tol: float | jax.Array = 1e-10,
    restart: int = 200,
    max_restarts: int = 5,
    precond: Optional[Callable[[jax.Array], jax.Array]] = None,
    compensated: bool = False,
) -> GmresResult:
    """Solve A x = b with right preconditioning: A M⁻¹ y = b, x = M⁻¹ y.

    ``matvec``/``precond`` are closures over the (pytree-of-arrays) system
    state; ``b`` is the flat RHS. Convergence is on the relative residual
    ||b - A x|| / ||b||, the same criterion Belos reports as achieved
    tolerance.

    ``compensated=True`` computes the Gram-Schmidt projections and norms
    with error-free-transform arithmetic (utils/compensated.py) so the
    orthogonalization noise floor drops from √n·2^-p to ~2^-2p — the
    emulated-precision mode's route below f32-native residuals.
    """
    M = precond if precond is not None else _identity
    n = b.shape[0]
    dtype = b.dtype

    if compensated:
        from skellysim_tpu.utils import compensated as _comp

        def _norm(v):
            return _comp.comp_norm(v)

        def _proj(Vb, w):
            # (m+1, n) @ (n,) with exact products + compensated reduction
            return _comp.dd_to(_comp.dd_matvec_f32exact(Vb, w))
    else:
        _norm = jnp.linalg.norm

        def _proj(Vb, w):
            return Vb @ w

    b_norm = _norm(b)
    # guard: zero RHS -> zero solution
    safe_b_norm = jnp.where(b_norm > 0.0, b_norm, 1.0)
    tol_abs = tol * safe_b_norm

    # a warm start (x0 from the previous timestep's solution) costs the same
    # as the zero start — the first restart cycle's residual matvec runs
    # either way — and earns its keep purely in iterations saved
    if x0 is None:
        x0 = jnp.zeros_like(b)

    m = restart

    arnoldi_iter = _make_arnoldi_iter(matvec, M, _norm, _proj, m, dtype)

    def inner_cond(carry):
        *_, j, res = carry
        return jnp.logical_and(j < m, res > tol_abs)

    def outer_body(carry):
        x, total_iters, _, _ = carry
        r = b - matvec(x)
        beta = _norm(r)
        V0 = jnp.zeros((m + 1, n), dtype)
        V0 = V0.at[0].set(jnp.where(beta > 0.0, r / jnp.where(beta > 0.0, beta, 1.0), r))
        H0 = jnp.zeros((m + 1, m), dtype)
        g0 = jnp.zeros(m + 1, dtype).at[0].set(beta)
        carry0 = (V0, H0, jnp.zeros(m, dtype), jnp.zeros(m, dtype), g0, 0, beta)
        V, H, cs, sn, g, j, res = jax.lax.while_loop(inner_cond, arnoldi_iter, carry0)

        # back-substitute the j×j triangular system (static m, masked)
        x_new = _ls_solution(x, M, V, H, g, j, m, dtype)
        return x_new, total_iters + j, res, beta

    def outer_cond(carry):
        _, total_iters, res, _ = carry
        return jnp.logical_and(total_iters < m * max_restarts, res > tol_abs)

    x, iters, res, _ = jax.lax.while_loop(
        outer_cond, outer_body, (x0, jnp.array(0), jnp.asarray(jnp.inf, dtype), b_norm)
    )
    x = jnp.where(b_norm > 0.0, x, jnp.zeros_like(x))
    # a non-finite RHS must POISON the result, not silently collapse it to
    # zeros through the b_norm > 0 guard (NaN compares False): callers see
    # NaN x / NaN residual / converged=False and reject the step, exactly
    # like a diverged solve
    b_bad = ~jnp.isfinite(b_norm)
    x = jnp.where(b_bad, jnp.full_like(x, jnp.nan), x)
    rel = jnp.where(b_bad, jnp.asarray(jnp.nan, dtype), res / safe_b_norm)
    # a NaN appearing INSIDE the iteration (e.g. a non-finite matvec or
    # preconditioner output) zeroes the Givens sine through its
    # where(denom>0) fallback and would otherwise masquerade as
    # "residual 0, converged" with a NaN solution — never report a
    # non-finite x as converged
    x_ok = jnp.all(jnp.isfinite(x))
    rel = jnp.where(x_ok, rel, jnp.asarray(jnp.nan, dtype))
    return GmresResult(x=x, residual=rel, iterations=iters, converged=rel <= tol)


@functools.partial(jax.jit, static_argnames=("matvec", "precond", "restart",
                                             "seg_iters"))
def gmres_segment(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: jax.Array,
    carry: Optional[GmresCarry] = None,
    *,
    tol: float | jax.Array = 1e-10,
    restart: int = 48,
    seg_iters: int = 8,
    precond: Optional[Callable[[jax.Array], jax.Array]] = None,
) -> GmresSegmentResult:
    """Up to ``seg_iters`` Arnoldi steps of ONE GMRES(restart) cycle,
    resumable across jitted programs.

    The tunneled-TPU watchdog kills single program executions beyond ~60 s
    (docs/chip_logs/r5a/probe_watchdog*), so ≥1e6-point solves cannot run
    one-shot. Round-5's first segmentation RESTARTED an 8-deep cycle per
    program — restarted GMRES(8) cycles/stalls on cold-start solves that
    plain GMRES finishes (the 4M-DOF step plateaued at residual 1.7e-2,
    chip log r5b/oocyte_1m_try10). This continuation threads the full
    Arnoldi state (``GmresCarry``) through the host loop instead: each
    program extends the SAME Krylov basis by ``seg_iters`` vectors, so the
    mathematics is plain GMRES(restart) no matter how it is segmented —
    the host restarts the cycle (fresh call with ``carry=None`` and the
    returned x as ``x0``) only when the basis genuinely fills.

    ``carry=None`` starts a cycle at ``x0`` (r0 = b − A x0); otherwise the
    cycle continues and ``x0`` must be the SAME cycle base. The returned
    ``x`` is the current least-squares estimate — valid mid-cycle, so the
    host can stop at any segment boundary. ``iterations`` counts inner
    iterations completed in this cycle (cumulative across its segments).

    Belos-parity note: same ||b − A x|| ≤ tol·||b|| exit criterion as
    ``gmres`` (solver_hydro.cpp:71)."""
    M = precond if precond is not None else _identity
    n = b.shape[0]
    dtype = b.dtype
    m = restart
    _norm = jnp.linalg.norm

    def _proj(Vb, w):
        return Vb @ w

    b_norm = _norm(b)
    safe_b_norm = jnp.where(b_norm > 0.0, b_norm, 1.0)
    tol_abs = tol * safe_b_norm

    def _cycle_init(V_buf):
        r = b - matvec(x0)
        beta = _norm(r)
        V0 = V_buf.at[0].set(jnp.where(beta > 0.0, r / jnp.where(beta > 0.0, beta, 1.0), r))
        return GmresCarry(
            V=V0, H=jnp.zeros((m + 1, m), dtype),
            cs=jnp.zeros(m, dtype), sn=jnp.zeros(m, dtype),
            g=jnp.zeros(m + 1, dtype).at[0].set(beta),
            j=jnp.asarray(0, jnp.int32), res=beta)

    if carry is None:
        carry = _cycle_init(jnp.zeros((m + 1, n), dtype))
    else:
        # j < 0 is the host's "start a cycle" sentinel: initializing under
        # lax.cond keeps ONE compiled program for every segment — a second
        # specialization at >=1e6-point scale would leave two full-step
        # executables resident (chip log r5b/oocyte_1m_try12-14)
        carry = jax.lax.cond(carry.j < 0,
                             lambda c: _cycle_init(c.V),
                             lambda c: c, carry)

    arnoldi_iter = _make_arnoldi_iter(matvec, M, _norm, _proj, m, dtype)
    j_end = jnp.minimum(carry.j + seg_iters, m)

    def inner_cond(c):
        *_, j, res = c
        return jnp.logical_and(j < j_end, res > tol_abs)

    V, H, cs, sn, g, j, res = jax.lax.while_loop(
        inner_cond, arnoldi_iter,
        (carry.V, carry.H, carry.cs, carry.sn, carry.g,
         carry.j.astype(jnp.int32), carry.res))

    x = _ls_solution(x0, M, V, H, g, j, m, dtype)
    x = jnp.where(b_norm > 0.0, x, jnp.zeros_like(x))
    # same poisoning semantics as gmres(): a non-finite RHS or iterate must
    # surface as NaN/converged=False, never as a silent zero solution
    b_bad = ~jnp.isfinite(b_norm)
    x = jnp.where(b_bad, jnp.full_like(x, jnp.nan), x)
    rel = jnp.where(b_bad, jnp.asarray(jnp.nan, dtype), res / safe_b_norm)
    x_ok = jnp.all(jnp.isfinite(x))
    rel = jnp.where(x_ok, rel, jnp.asarray(jnp.nan, dtype))
    new_carry = GmresCarry(V=V, H=H, cs=cs, sn=sn, g=g,
                           j=j.astype(jnp.int32), res=res)
    return GmresSegmentResult(x=x, residual=rel, iterations=j,
                              converged=rel <= tol, carry=new_carry)
