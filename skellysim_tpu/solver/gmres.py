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


def _identity(x):
    return x


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
        idx = jnp.arange(m)
        active = idx < j
        Hm = H[:m, :m] + jnp.diag(jnp.where(active, 0.0, 1.0).astype(dtype))
        gm = jnp.where(active, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(Hm, gm, lower=False)
        y = jnp.where(active, y, 0.0)
        x_new = x + M(V[:m].T @ y)
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
