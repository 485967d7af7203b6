"""Batched finite-difference fiber physics.

TPU-native re-design of the reference's per-fiber C++ loops
(src/core/fiber_finite_difference.cpp, src/core/fiber_container_finite_difference.cpp):
a *block* of B fibers sharing one node count n is a pytree of (B, ...) arrays,
and every operation — derivative chains, dense 4n×4n operator assembly,
rectangular boundary-condition rows, LU preconditioner factor/solve, force
operator, matvec — is a batched dense-linear-algebra expression the MXU
executes for the whole block at once. Mixed node counts become a small dict of
blocks (the reference's own discrete resolution set, matrices.py).

Physics summary (slender-body theory, same equations as the reference):
  state per fiber is (X, T): positions (n, 3) and tension (n,), solution
  layout [x; y; z; T] of length 4n. The implicit time step solves
  A (X^{n+1}, T^{n+1}) = RHS with local SBT drag coefficients
  c0 = -ln(e ε²)/(8πη), c1 = 1/(4πη) and bending rigidity E; the last 14 rows
  of A are boundary-condition rows (2 ends × {force/torque | velocity/angular
  velocity} × {3,1,3} components + tension conditions) after barycentric
  downsampling of the interior equations
  (fiber_finite_difference.cpp:97-187, 347-513).

Boundary-condition encoding (per fiber, per step):
  minus end: CLAMPED (velocity+angular velocity, when bound to a body or
  `minus_clamped`) or FREE (force+torque)
  plus end:  HINGED (velocity+torque, when bound to the periphery) or FREE
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from skellysim_tpu.fibers.matrices import fiber_matrices
from skellysim_tpu.kernels.reference import stokeslet_apply

# boundary-condition codes
BC_MINUS_FREE = 0      # Force + Torque
BC_MINUS_CLAMPED = 1   # Velocity + AngularVelocity
BC_PLUS_FREE = 0       # Force + Torque
BC_PLUS_HINGED = 1     # Velocity + Torque


@struct.dataclass
class FiberOperators:
    """Static (replicated) operator set for one node count, on device.

    Derivative matrices act from the left on node-major (n, ...) arrays and
    are unscaled (canonical alpha in [-1, 1]); physical scaling (2/L)^k is
    applied per fiber at use sites.
    """

    D1: jax.Array
    D2: jax.Array
    D3: jax.Array
    D4: jax.Array
    P_downsample_bc: jax.Array  # (4n-14, 4n)
    weights: jax.Array          # (n,) alpha-quadrature weights
    alpha: jax.Array            # (n,)

    @staticmethod
    def for_node_count(n: int, dtype=jnp.float64) -> "FiberOperators":
        m = fiber_matrices(n)
        conv = lambda a: jnp.asarray(a, dtype=dtype)
        return FiberOperators(
            D1=conv(m.D1), D2=conv(m.D2), D3=conv(m.D3), D4=conv(m.D4),
            P_downsample_bc=conv(m.P_downsample_bc), weights=conv(m.weights),
            alpha=conv(m.alpha),
        )


@struct.dataclass
class FiberOperatorsLo:
    """Double-word LOW parts of the derivative matrices, for the
    emulated-precision residual (utils/compensated.py).

    The finite-difference rows cancel ~(n/2)^k orders for smooth data, so
    f32 rounding of the WEIGHTS — not just of the operand — is amplified by
    the gross/net ratio. Splitting the f64 host matrices into f32 (hi, lo)
    pairs and applying them with dd_matvec removes that error channel.
    """

    D1: jax.Array
    D2: jax.Array
    D3: jax.Array
    D4: jax.Array

    @staticmethod
    def for_node_count(n: int, dtype=jnp.float32) -> "FiberOperatorsLo":
        m = fiber_matrices(n)

        def lo(a):
            hi = np.asarray(a, np.dtype(dtype)).astype(np.float64)
            return jnp.asarray(np.asarray(a, np.float64) - hi, dtype=dtype)

        return FiberOperatorsLo(D1=lo(m.D1), D2=lo(m.D2), D3=lo(m.D3),
                                D4=lo(m.D4))


@struct.dataclass
class FiberBlock:
    """A batch of B fibers sharing a node count n. All leaves are (B, ...)."""

    x: jax.Array                # (B, n, 3) node positions
    x_lo: jax.Array             # (B, n, 3) double-word low part of x — zero
                                # except in precision="emulated" runs, where
                                # (x, x_lo) carries ~2× the mantissa so the
                                # per-step increment (≈ dt·v ≪ |x|) survives
                                # f32 storage (see utils/compensated.py)
    tension: jax.Array          # (B, n)
    tension_lo: jax.Array       # (B, n) double-word low part of tension
    length: jax.Array           # (B,) target length
    length_prev: jax.Array      # (B,) last accepted length
    bending_rigidity: jax.Array  # (B,)
    radius: jax.Array           # (B,)
    force_scale: jax.Array      # (B,) motor force scale (f = fs * xs)
    penalty_param: jax.Array    # (B,) tension penalty (default 500)
    beta_tstep: jax.Array       # (B,) inextensibility penalty (default 1)
    v_growth: jax.Array         # (B,) polymerization velocity
    binding_body: jax.Array     # (B,) int32, -1 = unbound
    binding_site: jax.Array     # (B,) int32
    minus_clamped: jax.Array    # (B,) bool
    active: jax.Array           # (B,) bool — False rows are empty slots whose
                                # operator is identity and whose forces/flows
                                # are masked out (dynamic-instability padding)

    @property
    def n_fibers(self) -> int:
        return self.x.shape[0]

    @property
    def n_nodes(self) -> int:
        return self.x.shape[1]

    @property
    def solution_size(self) -> int:
        return 4 * self.n_fibers * self.n_nodes


@struct.dataclass
class FiberBlockCache:
    """Per-step cached quantities for a block (reference's update_cache_variables)."""

    xs: jax.Array       # (B, n, 3)
    xss: jax.Array
    xsss: jax.Array
    xssss: jax.Array
    c0: jax.Array       # (B,)
    c1: jax.Array       # (B,)
    A: jax.Array        # (B, 4n, 4n) BC-applied linear operator
    A_lu: jax.Array     # (B, 4n, 4n) LU factors of A
    A_piv: jax.Array    # (B, 4n) pivots
    force_operator: jax.Array  # (B, 3n, 4n) — NOT active-masked; the mask
                               # is applied to apply_fiber_force's OUTPUT
                               # (a (B, 4n·4n)-sized where here was the #2
                               # HLO temp of the 1M-point compile)
    RHS: jax.Array      # (B, 4n) BC-applied right-hand side
    bc_minus: jax.Array  # (B,) int BC code
    bc_plus: jax.Array   # (B,) int BC code
    active: jax.Array = None   # (B,) bool slot mask (see force_operator)


def make_fiber_block(
    x: np.ndarray,
    lengths,
    bending_rigidity,
    radius=0.0125,
    force_scale=0.0,
    penalty_param=500.0,
    beta_tstep=1.0,
    v_growth=0.0,
    binding_body=-1,
    binding_site=-1,
    minus_clamped=False,
    active=True,
    dtype=jnp.float64,
    emulated=False,
) -> FiberBlock:
    """Build a block from per-fiber data (scalars broadcast across the batch).

    ``emulated=True`` (with a working dtype narrower than the f64 input)
    seeds the double-word low parts so the stored (hi, lo) pair carries the
    input positions at full precision.
    """
    x64 = np.asarray(x, np.float64)
    x = jnp.asarray(x64, dtype=dtype)
    if x.ndim == 2:
        x = x[None]
        x64 = x64[None]
    B = x.shape[0]
    if emulated and jnp.dtype(dtype).itemsize < 8:
        x_lo = jnp.asarray(x64 - x64.astype(np.dtype(dtype)).astype(np.float64),
                           dtype=dtype)
    else:
        x_lo = jnp.zeros_like(x)
    arr = lambda v, dt=dtype: jnp.broadcast_to(jnp.asarray(v, dtype=dt), (B,))
    return FiberBlock(
        x=x,
        x_lo=x_lo,
        tension=jnp.zeros((B, x.shape[1]), dtype=dtype),
        tension_lo=jnp.zeros((B, x.shape[1]), dtype=dtype),
        length=arr(lengths),
        length_prev=arr(lengths),
        bending_rigidity=arr(bending_rigidity),
        radius=arr(radius),
        force_scale=arr(force_scale),
        penalty_param=arr(penalty_param),
        beta_tstep=arr(beta_tstep),
        v_growth=arr(v_growth),
        binding_body=arr(binding_body, jnp.int32),
        binding_site=arr(binding_site, jnp.int32),
        minus_clamped=jnp.broadcast_to(jnp.asarray(minus_clamped, dtype=bool), (B,)),
        active=jnp.broadcast_to(jnp.asarray(active, dtype=bool), (B,)),
    )


def sbt_constants(block: FiberBlock, eta):
    """Local slender-body drag coefficients (fiber_finite_difference.hpp:140-144).

    c0 = -ln(e ε²) / (8πη), c1 = 2/(8πη), ε = radius / length.

    ln(e ε²) = 1 + 2 ln ε with the accurate elementwise log
    (utils/compensated.py): the TPU's f32 log primitive is ~4e-6-accurate,
    and c0 multiplies every fiber velocity — the error showed up verbatim
    as a 3.85e-6 drag-gate bias.
    """
    from skellysim_tpu.utils.compensated import accurate_log

    eps = block.radius / block.length
    c0 = -(1.0 + 2.0 * accurate_log(eps)) / (8.0 * jnp.pi * eta)
    c1 = 2.0 / (8.0 * jnp.pi * eta)
    return c0, jnp.broadcast_to(c1, c0.shape)


def derivatives(block: FiberBlock, ops: FiberOperators,
                ops_lo: Optional["FiberOperatorsLo"] = None):
    """xs..xssss with (2/L_prev)^k scaling (fiber_finite_difference.cpp:62-68).

    With ``ops_lo`` (emulated mode) the D_k applications run as double-word
    matvecs of the (hi, lo) matrix/state pairs: the FD row sums cancel
    ~(n/2)^k orders for smooth fibers, and the TPU's matmul passes lose
    ~100× more of that cancellation than true-f32 FMA chains (measured:
    A-entry error 4.5e-1 on chip vs 4.6e-3 CPU-f32 for the same state) —
    enough to bias drag velocities at ~4e-6 relative.
    """
    s = 2.0 / block.length_prev
    if ops_lo is None:
        dx = lambda D, k: (s**k)[:, None, None] * jnp.einsum("ab,nbc->nac", D, block.x)
        return dx(ops.D1, 1), dx(ops.D2, 2), dx(ops.D3, 3), dx(ops.D4, 4)

    from skellysim_tpu.utils import compensated as comp

    def dx(D, D_lo, k):
        vh = jnp.moveaxis(block.x, 1, 2)
        vl = jnp.moveaxis(block.x_lo, 1, 2)
        d = comp.dd_matvec(D, vh, M_lo=D_lo, x_lo=vl)
        d = comp.dd_scale(d, (s**k)[:, None, None])
        return jnp.moveaxis(comp.dd_to(d), 2, 1)

    return (dx(ops.D1, ops_lo.D1, 1), dx(ops.D2, ops_lo.D2, 2),
            dx(ops.D3, ops_lo.D3, 3), dx(ops.D4, ops_lo.D4, 4))


def assemble_linear_operator(
    block: FiberBlock,
    ops: FiberOperators,
    xs: jax.Array,
    xss: jax.Array,
    xsss: jax.Array,
    c0: jax.Array,
    c1: jax.Array,
    dt,
) -> jax.Array:
    """(B, 4n, 4n) implicit-step operator (fiber_finite_difference.cpp:97-187).

    Blocks (i, j ∈ {x, y, z}):
      A[i][j] = β/dt δ_ij I + E [c0 (δ_ij + xs_i xs_j) + c1 (δ_ij − xs_i xs_j)] D4
      A[i][T] = −2 c0 diag(xs_i) D1 − (c0+c1) diag(xss_i)
      A[T][j] = −(c1+7c0) E diag(xss_j) D4 − 6 c0 E diag(xsss_j) D3
                − p diag(xs_j) D1
      A[T][T] = −2 c0 D2 + (c0+c1) diag(|xss|²)
    """
    n = block.n_nodes
    B = block.n_fibers
    s = 2.0 / block.length
    E = block.bending_rigidity
    I = jnp.eye(n, dtype=block.x.dtype)

    # scaled derivative operators per fiber: (B, n, n)
    D1 = s[:, None, None] ** 1 * ops.D1
    D2 = s[:, None, None] ** 2 * ops.D2
    D3 = s[:, None, None] ** 3 * ops.D3
    D4 = s[:, None, None] ** 4 * ops.D4

    bdt = (block.beta_tstep / dt)[:, None, None]
    c0b = c0[:, None, None]
    c1b = c1[:, None, None]
    Eb = E[:, None, None]

    def xyz_block(i, j):
        # diag(w) @ D4 where w couples tangents
        prod = xs[:, :, i] * xs[:, :, j]
        if i == j:
            w = c0b * (1.0 + prod)[:, :, None] + c1b * (1.0 - prod)[:, :, None]
            blk = bdt * I + Eb * w * D4
        else:
            w = (c0b - c1b) * prod[:, :, None]
            blk = Eb * w * D4
        return blk

    def xT_block(i):
        return (-2.0 * c0b) * xs[:, :, i, None] * D1 - (
            (c0 + c1)[:, None, None] * jax.vmap(jnp.diag)(xss[:, :, i])
        )

    def Tx_block(j):
        return (
            -(c1 + 7.0 * c0)[:, None, None] * Eb * xss[:, :, j, None] * D4
            - 6.0 * c0b * Eb * xsss[:, :, j, None] * D3
            - block.penalty_param[:, None, None] * xs[:, :, j, None] * D1
        )

    TT = -2.0 * c0b * D2 + (c0 + c1)[:, None, None] * jax.vmap(jnp.diag)(
        jnp.sum(xss * xss, axis=-1)
    )

    rows = []
    for i in range(3):
        rows.append(jnp.concatenate([xyz_block(i, 0), xyz_block(i, 1), xyz_block(i, 2), xT_block(i)], axis=2))
    rows.append(jnp.concatenate([Tx_block(0), Tx_block(1), Tx_block(2), TT], axis=2))
    return jnp.concatenate(rows, axis=1)


def assemble_force_operator(
    block: FiberBlock, ops: FiberOperators, xs: jax.Array, xss: jax.Array
) -> jax.Array:
    """(B, 3n, 4n) map (X, T) → force density (fiber_finite_difference.cpp:317-335).

    f_i = −E X_i'''' + T X_i'' + T' X_i'  (per component i), i.e. per block:
      F[i][i] = −E D4,   F[i][T] = diag(xss_i) + diag(xs_i) D1.
    """
    n = block.n_nodes
    s = 2.0 / block.length
    D1 = s[:, None, None] ** 1 * ops.D1
    D4 = s[:, None, None] ** 4 * ops.D4
    negED4 = -block.bending_rigidity[:, None, None] * D4
    zero = jnp.zeros_like(negED4)
    rows = []
    for i in range(3):
        Ft = jax.vmap(jnp.diag)(xss[:, :, i]) + xs[:, :, i, None] * D1
        blocks = [zero, zero, zero]
        blocks[i] = negED4
        rows.append(jnp.concatenate(blocks + [Ft], axis=2))
    return jnp.concatenate(rows, axis=1)


def update_rhs(
    block: FiberBlock,
    ops: FiberOperators,
    xs: jax.Array,
    xss: jax.Array,
    c0: jax.Array,
    c1: jax.Array,
    dt,
    flow: Optional[jax.Array],
    f_external: Optional[jax.Array],
) -> jax.Array:
    """(B, 4n) pre-BC right-hand side (fiber_finite_difference.cpp:198-274).

    RHS_X = X/dt + s_dot xs + u + (c0 (I + xs xsᵀ) + c1 (I − xs xsᵀ)) f
    RHS_T = −p + d/ds(xs)·u' ... specifically xs·u' + 2 c0 xs·f' + (c0−c1) xss·f
    with s_dot = (1+α)(v_growth/2) the polymerization stretch term.
    """
    B, n = block.n_fibers, block.n_nodes
    s = 2.0 / block.length
    D1 = s[:, None, None] * ops.D1  # (B, n, n)
    s_dot = (1.0 + ops.alpha)[None, :] * (0.5 * block.v_growth)[:, None]

    rhs_xyz = block.x / jnp.asarray(dt) + s_dot[:, :, None] * xs
    rhs_T = -block.penalty_param[:, None] * jnp.ones((B, n), block.x.dtype)

    if flow is not None:
        rhs_xyz = rhs_xyz + flow
        du = jnp.einsum("bnm,bmc->bnc", D1, flow)
        rhs_T = rhs_T + jnp.sum(xs * du, axis=-1)
    if f_external is not None:
        f = f_external
        xsf = jnp.sum(xs * f, axis=-1)  # (B, n)
        c0b = c0[:, None, None]
        c1b = c1[:, None, None]
        rhs_xyz = rhs_xyz + c0b * (f + xsf[:, :, None] * xs) + c1b * (f - xsf[:, :, None] * xs)
        df = jnp.einsum("bnm,bmc->bnc", D1, f)
        rhs_T = rhs_T + 2.0 * c0[:, None] * jnp.sum(xs * df, axis=-1)
        rhs_T = rhs_T + (c0 - c1)[:, None] * jnp.sum(xss * f, axis=-1)

    return jnp.concatenate(
        [rhs_xyz[:, :, 0], rhs_xyz[:, :, 1], rhs_xyz[:, :, 2], rhs_T], axis=1
    )


def _bc_rows(
    block: FiberBlock,
    ops: FiberOperators,
    xs, xss, c0, c1, dt,
    bc_minus, bc_plus,
    v_on_fiber, f_on_fiber,
):
    """Build the (B, 14, 4n) boundary-condition row block and its (B, 14) RHS.

    Rectangular BCs (fiber_finite_difference.cpp:347-513): both variants per
    end are assembled for the whole batch and selected with `where` on the
    per-fiber BC codes — no data-dependent control flow under jit.
    """
    B, n = block.n_fibers, block.n_nodes
    dtype = block.x.dtype
    s = 2.0 / block.length
    D1 = s[:, None, None] ** 1 * ops.D1
    D2 = s[:, None, None] ** 2 * ops.D2
    D3 = s[:, None, None] ** 3 * ops.D3
    E = block.bending_rigidity
    bdt = block.beta_tstep / dt

    x0, xend = block.x[:, 0, :], block.x[:, -1, :]
    xs0, xsend = xs[:, 0, :], xs[:, -1, :]
    xss0, xssend = xss[:, 0, :], xss[:, -1, :]
    v0 = v_on_fiber[:, 0, :] if v_on_fiber is not None else jnp.zeros((B, 3), dtype)
    vend = v_on_fiber[:, -1, :] if v_on_fiber is not None else jnp.zeros((B, 3), dtype)
    f0 = f_on_fiber[:, 0, :] if f_on_fiber is not None else jnp.zeros((B, 3), dtype)
    fend = f_on_fiber[:, -1, :] if f_on_fiber is not None else jnp.zeros((B, 3), dtype)

    D1_0, D2_0, D3_0 = D1[:, 0, :], D2[:, 0, :], D3[:, 0, :]   # (B, n)
    D1_e, D2_e, D3_e = D1[:, -1, :], D2[:, -1, :], D3[:, -1, :]

    def put(rows_b, r, comp, vals):
        return rows_b.at[:, r, comp * n:(comp + 1) * n].set(vals)

    def put_col(rows_b, r, col, vals):
        return rows_b.at[:, r, col].set(vals)

    # ---- minus end, rows 0-3 ----
    # CLAMPED (Velocity): pin position and project the tension equation
    rows_cl = jnp.zeros((B, 14, 4 * n), dtype)
    rhs_cl = jnp.zeros((B, 14), dtype)
    for i in range(3):
        rows_cl = put_col(rows_cl, i, i * n, bdt)
        rhs_cl = rhs_cl.at[:, i].set(x0[:, i] / dt)
    for i in range(3):
        rows_cl = put(rows_cl, 3, i, (6.0 * E * c0)[:, None] * xss0[:, i, None] * D3_0)
    rows_cl = put(rows_cl, 3, 3, (2.0 * c0)[:, None] * D1_0)
    rhs_cl = rhs_cl.at[:, 3].set(
        -jnp.sum(xs0 * v0, axis=-1) - 2.0 * c0 * jnp.sum(xs0 * f0, axis=-1)
    )
    # FREE (Force): zero end force and tension condition
    rows_fr = jnp.zeros((B, 14, 4 * n), dtype)
    rhs_fr = jnp.zeros((B, 14), dtype)
    for i in range(3):
        rows_fr = put(rows_fr, i, i, E[:, None] * D3_0)
        rows_fr = put_col(rows_fr, i, 3 * n, -xs0[:, i])
        rhs_fr = rhs_fr.at[:, i].set(f0[:, i])
    for i in range(3):
        rows_fr = put(rows_fr, 3, i, -E[:, None] * xss0[:, i, None] * D2_0)
    rows_fr = put_col(rows_fr, 3, 3 * n, -jnp.ones((B,), dtype))
    rhs_fr = rhs_fr.at[:, 3].set(jnp.sum(f0 * xs0, axis=-1))

    is_cl = (bc_minus == BC_MINUS_CLAMPED)[:, None, None]
    rows = jnp.where(is_cl, rows_cl, rows_fr)
    rhs = jnp.where(is_cl[:, :, 0], rhs_cl, rhs_fr)

    # ---- minus end, rows 4-6: AngularVelocity (clamped) vs Torque (free) ----
    rows_av = jnp.zeros((B, 14, 4 * n), dtype)
    rhs_av = jnp.zeros((B, 14), dtype)
    rows_tq = jnp.zeros((B, 14, 4 * n), dtype)
    rhs_tq = jnp.zeros((B, 14), dtype)
    for i in range(3):
        rows_av = put(rows_av, 4 + i, i, bdt[:, None] * D1_0)
        rhs_av = rhs_av.at[:, 4 + i].set(xs0[:, i] / dt)
        rows_tq = put(rows_tq, 4 + i, i, D2_0)
    rows = rows + jnp.where(is_cl, rows_av, rows_tq)
    rhs = rhs + jnp.where(is_cl[:, :, 0], rhs_av, rhs_tq)

    # ---- plus end, rows 7-10: HINGED (Velocity) vs FREE (Force) ----
    rows_hg = jnp.zeros((B, 14, 4 * n), dtype)
    rhs_hg = jnp.zeros((B, 14), dtype)
    # pinned position rows touch the LAST node of each component, matching the
    # reference's column choice (fiber_finite_difference.cpp:447-449)
    rows_hg = put_col(rows_hg, 7, 1 * n - 1, bdt)
    rows_hg = put_col(rows_hg, 8, 2 * n - 1, bdt)
    rows_hg = put_col(rows_hg, 9, 3 * n - 1, bdt)
    rhs_hg = rhs_hg.at[:, 7].set(xend[:, 0] / dt)
    rhs_hg = rhs_hg.at[:, 8].set(xend[:, 1] / dt)
    rhs_hg = rhs_hg.at[:, 9].set(xend[:, 2] / dt)
    for i in range(3):
        rows_hg = put(rows_hg, 10, i, (6.0 * E * c0)[:, None] * xssend[:, i, None] * D3_e)
    rows_hg = put(rows_hg, 10, 3, (2.0 * c0)[:, None] * D1_e)
    rhs_hg = rhs_hg.at[:, 10].set(
        -jnp.sum(xsend * vend, axis=-1) - 2.0 * c0 * jnp.sum(xsend * fend, axis=-1)
    )

    rows_pf = jnp.zeros((B, 14, 4 * n), dtype)
    rhs_pf = jnp.zeros((B, 14), dtype)
    for i in range(3):
        rows_pf = put(rows_pf, 7 + i, i, -E[:, None] * D3_e)
        rows_pf = put_col(rows_pf, 7 + i, 4 * n - 1, xsend[:, i])
        rhs_pf = rhs_pf.at[:, 7 + i].set(fend[:, i])
    for i in range(3):
        rows_pf = put(rows_pf, 10, i, E[:, None] * xssend[:, i, None] * D2_e)
    rows_pf = put_col(rows_pf, 10, 4 * n - 1, jnp.ones((B,), dtype))
    rhs_pf = rhs_pf.at[:, 10].set(jnp.sum(fend * xsend, axis=-1))

    is_hg = (bc_plus == BC_PLUS_HINGED)[:, None, None]
    rows = rows + jnp.where(is_hg, rows_hg, rows_pf)
    rhs = rhs + jnp.where(is_hg[:, :, 0], rhs_hg, rhs_pf)

    # ---- plus end, rows 11-13: Torque (always) ----
    rows_pt = jnp.zeros((B, 14, 4 * n), dtype)
    for i in range(3):
        rows_pt = put(rows_pt, 11 + i, i, D2_e)
    rows = rows + rows_pt

    return rows, rhs


def apply_boundary_conditions(
    block: FiberBlock,
    ops: FiberOperators,
    A: jax.Array,
    RHS: jax.Array,
    xs, xss, c0, c1, dt,
    bc_minus, bc_plus,
    v_on_fiber=None,
    f_on_fiber=None,
):
    """Downsample interior equations and install the 14 BC rows.

    Returns (A_bc, RHS_bc): A_bc = [P A; B_rows], RHS_bc = [P rhs; b_rows]
    (fiber_finite_difference.cpp:347-363).
    """
    P = ops.P_downsample_bc
    A_top = jnp.einsum("ra,bac->brc", P, A)
    rhs_top = jnp.einsum("ra,ba->br", P, RHS)
    bc_rows, bc_rhs = _bc_rows(
        block, ops, xs, xss, c0, c1, dt, bc_minus, bc_plus, v_on_fiber, f_on_fiber
    )
    A_bc = jnp.concatenate([A_top, bc_rows], axis=1)
    RHS_bc = jnp.concatenate([rhs_top, bc_rhs], axis=1)
    return A_bc, RHS_bc


# batched-QR chunking thresholds (see factorize): sequence the inverse when
# the input exceeds the first; each lax.map chunk targets the second
_FACTORIZE_CHUNK_INPUT_BYTES = 256 * 2**20
_FACTORIZE_CHUNK_TARGET_BYTES = 64 * 2**20


def factorize(A: jax.Array):
    """Batched explicit inverses of the BC-applied operators.

    The block-Jacobi preconditioner is APPLIED once per GMRES iteration but
    built once per step, so the apply must be MXU work: a batched LU solve
    lowers to triangular solves that serialize over the 4n columns on TPU
    (hundreds of sequential (B, 4n) steps), while A⁻¹ x is one batched
    (B, 4n, 4n) @ (B, 4n) matmul. The inverse itself is computed by LU once
    per step; a right preconditioner only shapes convergence, so its f32
    rounding costs at most an extra iteration, never accuracy.
    (Field names A_lu/A_piv are kept for the cache pytree: A_lu now holds
    A⁻¹ and A_piv is empty.)

    Robustness (round-3 chip finding): the BC-applied operator mixes O(1)
    constraint rows with O((n/L)⁴·κ/dt) interior rows, and TPU XLA's f32
    LU-based inv() produced Inf/NaN inverses for a handful of such
    matrices at oocyte scale (5/3000; 2/3000 after row equilibration
    alone), silently poisoning every solve — where LAPACK's pivoted LU on
    CPU survives. Build therefore row-equilibrates (A⁻¹ = inv(D·A)·D) and
    inverts via Householder QR (backward-stable without pivoting, still
    matmul-rich on the MXU); any remaining non-finite inverse falls back to the
    equilibration diagonal (Jacobi row scaling) for that fiber — a weaker
    but finite preconditioner block."""
    m = A.shape[-1]
    B = A.shape[0]

    def _inv_batch(Ab):
        s = 1.0 / jnp.maximum(jnp.max(jnp.abs(Ab), axis=-1), 1e-30)  # (b, 4n)
        A_eq = Ab * s[..., :, None]

        def qr_inv(a):
            q, r = jnp.linalg.qr(a)
            return jax.scipy.linalg.solve_triangular(r, q.T, lower=False)

        inv = jax.vmap(qr_inv)(A_eq)
        inv = inv * s[..., None, :]
        bad = ~jnp.all(jnp.isfinite(inv), axis=(-2, -1))             # (b,)
        diag_fallback = jnp.eye(m, dtype=Ab.dtype)[None] * s[..., :, None]
        return jnp.where(bad[:, None, None], diag_fallback, inv)

    # ≥1e6-point regime: a single batched QR over (31000, 128, 128) keeps
    # multi-GB Q/R/workspace temps alive at once; above ~0.25 GB of input,
    # sequence the inverse in lax.map chunks (same MXU work, bounded temps)
    if B * m * m * A.dtype.itemsize > _FACTORIZE_CHUNK_INPUT_BYTES:
        chunk = max(1, _FACTORIZE_CHUNK_TARGET_BYTES
                    // max(m * m * A.dtype.itemsize, 1))
        for div in range(chunk, max(chunk // 2, 1) - 1, -1):
            if B % div == 0:   # avoid the pad → [:B] slice copy
                chunk = div
                break
        pad = (-B) % chunk
        A_p = jnp.concatenate(
            [A, jnp.broadcast_to(jnp.eye(m, dtype=A.dtype), (pad, m, m))]
        ) if pad else A
        inv = jax.lax.map(_inv_batch,
                          A_p.reshape(-1, chunk, m, m)).reshape(-1, m, m)
        inv = inv[:B] if pad else inv
    else:
        inv = _inv_batch(A)
    return inv, jnp.zeros((B, 0), jnp.int32)


def precondition(cache: FiberBlockCache, x_all: jax.Array) -> jax.Array:
    """y_b = A_b⁻¹ x_b via one batched matmul (see ``factorize``)."""
    B = cache.A_lu.shape[0]
    xb = x_all.reshape(B, -1)
    if cache.A_lu.dtype == jnp.bfloat16:
        y = jnp.einsum("bij,bj->bi", cache.A_lu, xb.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32).astype(x_all.dtype)
        return y.reshape(-1)
    y = jnp.einsum("bij,bj->bi", cache.A_lu, xb)
    return y.reshape(-1)


def matvec(
    block: FiberBlock,
    ops: FiberOperators,
    cache: FiberBlockCache,
    x_all: jax.Array,       # (B*4n,) fiber component of the solution vector
    v_fib: jax.Array,       # (B, n, 3) velocity at fiber nodes from all objects
    v_boundary: Optional[jax.Array] = None,  # (B, 7) body-link velocity terms
    include_A: bool = True,
    exact_A: bool = False,
) -> jax.Array:
    """Fiber block-row of the global operator (fiber_finite_difference.cpp:276-312).

    y = A x − P [v; d/ds(xs·v)] + (end-tangency terms) + (body-link BC terms).

    ``include_A=False`` returns only the velocity-coupling terms W(x) (the
    emulated-precision path evaluates A·s_prev separately in factored
    double-word arithmetic — ``residual_delta``). ``exact_A=True`` applies
    the stored f32 operator with error-free products + compensated reduction
    (the emulated GMRES operator: kills the √(4n)·2^-p matvec noise that
    otherwise floors the attainable residual).
    """
    from skellysim_tpu.utils import compensated as comp

    B, n = block.n_fibers, block.n_nodes
    dtype = block.x.dtype
    xb = x_all.reshape(B, 4 * n)
    if not include_A:
        Ax = jnp.zeros((B, 4 * n), dtype)
    elif exact_A:
        Ax = comp.dd_to(comp.dd_matvec_f32exact(cache.A, xb))
    else:
        Ax = jnp.einsum("brc,bc->br", cache.A, xb)
    v_fib = jnp.where(block.active[:, None, None], v_fib, 0.0)

    s = 2.0 / block.length_prev
    D1 = s[:, None, None] * ops.D1
    # tension row: derivative of the pointwise tangent-velocity product
    xsv = jnp.sum(cache.xs * v_fib, axis=-1)               # (B, n)
    dT = jnp.einsum("bnm,bm->bn", D1, xsv)
    vT = jnp.concatenate([v_fib[:, :, 0], v_fib[:, :, 1], v_fib[:, :, 2], dT], axis=1)
    vT_in = jnp.einsum("ra,ba->br", ops.P_downsample_bc, vT)
    vT_in = jnp.concatenate([vT_in, jnp.zeros((B, 14), dtype)], axis=1)

    bc_start = 4 * n - 14
    xs_vT = jnp.zeros((B, 4 * n), dtype)
    xs_vT = xs_vT.at[:, bc_start + 3].set(jnp.sum(v_fib[:, 0, :] * cache.xs[:, 0, :], axis=-1))
    plus_vel = (cache.bc_plus == BC_PLUS_HINGED).astype(dtype)
    xs_vT = xs_vT.at[:, bc_start + 10].set(
        plus_vel * jnp.sum(v_fib[:, -1, :] * cache.xs[:, -1, :], axis=-1)
    )

    y = Ax - vT_in + xs_vT
    if v_boundary is not None:
        y = y.at[:, bc_start:bc_start + 7].add(v_boundary)
    return y.reshape(-1)


def apply_fiber_force(cache: FiberBlockCache, x_all: jax.Array) -> jax.Array:
    """(B, n, 3) force density from a candidate solution via the force operator."""
    B = cache.force_operator.shape[0]
    n = cache.force_operator.shape[1] // 3
    xb = x_all.reshape(B, 4 * n)
    f = jnp.einsum("brc,bc->br", cache.force_operator, xb)  # (B, 3n)
    # the slot mask is mandatory — a cache built without it would silently
    # reinstate garbage forces from inactive slots (force_operator is no
    # longer masked at build time)
    assert cache.active is not None, "FiberBlockCache.active missing"
    # slot mask on the OUTPUT: equivalent to masking the stored (3n,4n)
    # operator (select discards any garbage from inactive slots) at
    # 1/(4n)th the temp footprint
    f = jnp.where(cache.active[:, None], f, 0.0)
    return f.reshape(B, 3, n).transpose(0, 2, 1)


def weighted_forces(block: FiberBlock, ops: FiberOperators, forces: jax.Array) -> jax.Array:
    """Quadrature-weight node forces for kernel evaluation: w = (L/2) w_alpha."""
    w = 0.5 * block.length[:, None] * ops.weights[None, :]
    w = jnp.where(block.active[:, None], w, 0.0)
    return forces * w[:, :, None]


def self_flow(block: FiberBlock, wf: jax.Array, eta) -> jax.Array:
    """(B, n, 3) per-fiber self-interaction velocity (the subtracted Oseen term).

    Instead of materializing the reference's per-fiber 3n×3n stokeslet matrix
    (fiber_finite_difference.cpp:56) we evaluate the self apply directly.
    """
    return jax.vmap(lambda x, f: stokeslet_apply(x, f, x, eta))(block.x, wf)


def fiber_error(block: FiberBlock, ops: FiberOperators) -> jax.Array:
    """max |‖xs‖ − 1| over the block, with xs at the *target* length
    (fiber_container_finite_difference.cpp:79-89)."""
    s = 2.0 / block.length
    xs = s[:, None, None] * jnp.einsum("ab,nbc->nac", ops.D1, block.x)
    err = jnp.abs(jnp.linalg.norm(xs, axis=-1) - 1.0)
    err = jnp.where(block.active[:, None], err, 0.0)
    return jnp.max(err) if err.size else jnp.zeros((), block.x.dtype)


def step(block: FiberBlock, solution: jax.Array) -> FiberBlock:
    """Advance positions/tension from the solved [x; y; z; T] layout."""
    B, n = block.n_fibers, block.n_nodes
    sol = solution.reshape(B, 4, n)
    x_new = sol[:, :3, :].transpose(0, 2, 1)
    act = block.active
    x_new = jnp.where(act[:, None, None], x_new, block.x)
    t_new = jnp.where(act[:, None], sol[:, 3, :], block.tension)
    return block.replace(x=x_new, tension=t_new, length_prev=block.length)


def pack_solution(block: FiberBlock) -> jax.Array:
    """(B·4n,) solution-layout vector [x; y; z; T] of the stored state
    (hi parts) — the warm-start / residual expansion point s_prev."""
    return jnp.concatenate(
        [block.x[:, :, 0], block.x[:, :, 1], block.x[:, :, 2], block.tension],
        axis=1).reshape(-1)


def step_delta(block: FiberBlock, delta: jax.Array) -> FiberBlock:
    """Advance the double-word state by a solved increment δ = s_new − s_prev.

    The emulated-precision counterpart of ``step``: positions and tension
    are (hi, lo) pairs and the increment (≈ dt·v ≪ |x|) is folded in with
    error-free two_sum chains, so per-step update rounding is ~2^-2p of |x|
    instead of 2^-p (the error that dominated plain-f32 long runs).
    """
    from skellysim_tpu.utils import compensated as comp

    B, n = block.n_fibers, block.n_nodes
    sol = delta.reshape(B, 4, n)
    dx = sol[:, :3, :].transpose(0, 2, 1)
    xh, xl = comp.dd_add_f((block.x, block.x_lo), dx)
    th, tl = comp.dd_add_f((block.tension, block.tension_lo), sol[:, 3, :])
    act = block.active
    m3 = act[:, None, None]
    m2 = act[:, None]
    return block.replace(
        x=jnp.where(m3, xh, block.x), x_lo=jnp.where(m3, xl, block.x_lo),
        tension=jnp.where(m2, th, block.tension),
        tension_lo=jnp.where(m2, tl, block.tension_lo),
        length_prev=block.length)


def residual_delta(
    block: FiberBlock,
    ops: FiberOperators,
    ops_lo: FiberOperatorsLo,
    eta,
    dt,
    bc_minus, bc_plus,
    flow: Optional[jax.Array] = None,
    f_external: Optional[jax.Array] = None,
    v_on_fiber: Optional[jax.Array] = None,
    f_on_fiber: Optional[jax.Array] = None,
) -> jax.Array:
    """(B, 4n) double-word-accurate residual  RHS_bc − A_bc · s_prev  of the
    stored state, with the β/dt-scale terms cancelled SYMBOLICALLY.

    This is the increment-form (iterative-refinement) solve that reaches the
    reference's tight-tolerance regime (gmres_tol 1e-10,
    src/core/params.cpp:14) on an f32-only chip: GMRES solves A·δ = r₀ for
    the velocity-scale increment, and the attainable physics accuracy is set
    by r₀'s precision, not by the f32 operator. Three error channels are
    closed here:
      * β/dt·x terms of A·s_prev vs the x/dt terms of the RHS
        (fiber_finite_difference.cpp:198-274) cancel exactly in exact
        arithmetic but at ~|x|/(dt·v) relative noise in f32 — they are
        dropped from both sides analytically;
      * high-order derivative applications D_k·x amplify rounding by the
        FD gross/net ratio — applied as double-word matvecs of (hi, lo)
        matrix and state pairs (exact to ~2^-2p);
      * the tension equation's  −p(1 − |x_s|²)  penalty cancellation is
        evaluated as a dd dot product.
    All remaining combinations act on already-cancelled velocity-scale
    values, where plain f32 is ~1e-7 relative.
    """
    from skellysim_tpu.utils import compensated as comp

    B, n = block.n_fibers, block.n_nodes
    dtype = block.x.dtype
    E = block.bending_rigidity
    beta = block.beta_tstep
    p_pen = block.penalty_param
    c0, c1 = sbt_constants(block, eta)
    dt = jnp.asarray(dt, dtype)

    # dd canonical derivative chains of the stored dd state
    def ddDx(D, D_lo):
        vh = jnp.moveaxis(block.x, 1, 2)      # (B, 3, n)
        vl = jnp.moveaxis(block.x_lo, 1, 2)
        h, l = comp.dd_matvec(D, vh, M_lo=D_lo, x_lo=vl)
        return jnp.moveaxis(h, 2, 1), jnp.moveaxis(l, 2, 1)   # (B, n, 3) dd

    def ddDT(D, D_lo):
        return comp.dd_matvec(D, block.tension, M_lo=D_lo,
                              x_lo=block.tension_lo)           # (B, n) dd

    dx1 = ddDx(ops.D1, ops_lo.D1)
    dx2 = ddDx(ops.D2, ops_lo.D2)
    dx3 = ddDx(ops.D3, ops_lo.D3)
    dx4 = ddDx(ops.D4, ops_lo.D4)
    dT1 = ddDT(ops.D1, ops_lo.D1)
    dT2 = ddDT(ops.D2, ops_lo.D2)

    # physical scalings: cache derivatives (coefficients) use 2/length_prev,
    # the operator's D_k use 2/length (mirroring derivatives() vs
    # assemble_linear_operator/update_rhs)
    sp = (2.0 / block.length_prev)[:, None, None]
    sl = (2.0 / block.length)[:, None, None]
    xs_dd = comp.dd_scale(dx1, sp)            # (B, n, 3) dd, cache scaling
    xs = comp.dd_to(xs_dd)
    xss = comp.dd_to(comp.dd_scale(dx2, sp ** 2))
    xsss = comp.dd_to(comp.dd_scale(dx3, sp ** 3))
    d2x = comp.dd_to(comp.dd_scale(dx2, sl ** 2))   # operator scaling
    d3x = comp.dd_to(comp.dd_scale(dx3, sl ** 3))
    d4x = comp.dd_to(comp.dd_scale(dx4, sl ** 4))
    dT1_l = comp.dd_to(comp.dd_scale(dT1, sl[:, :, 0]))
    dT2_l = comp.dd_to(comp.dd_scale(dT2, sl[:, :, 0] ** 2))
    T = block.tension

    c0b, c1b = c0[:, None, None], c1[:, None, None]
    Eb = E[:, None, None]

    # ---- interior xyz rows:  RHS_x − (A·s)_x  with β/dt·x dropped ----
    one_m_beta = (1.0 - beta)
    R_xyz = (one_m_beta / dt)[:, None, None] * block.x
    s_dot = (1.0 + ops.alpha)[None, :] * (0.5 * block.v_growth)[:, None]
    R_xyz = R_xyz + s_dot[:, :, None] * xs
    if flow is not None:
        R_xyz = R_xyz + flow
    if f_external is not None:
        xsf = jnp.sum(xs * f_external, axis=-1)
        R_xyz = (R_xyz + c0b * (f_external + xsf[:, :, None] * xs)
                 + c1b * (f_external - xsf[:, :, None] * xs))
    # − E[(c0+c1)·d4x_i + (c0−c1)·xs_i·(xs·d4x)]
    xs_d4x = jnp.sum(xs * d4x, axis=-1)
    R_xyz = R_xyz - Eb * ((c0 + c1)[:, None, None] * d4x
                          + (c0 - c1)[:, None, None] * xs_d4x[:, :, None] * xs)
    # + 2c0·xs_i·(D1 T) + (c0+c1)·xss_i·T   (−A_xT·T)
    R_xyz = R_xyz + 2.0 * c0b * xs * dT1_l[:, :, None]
    R_xyz = R_xyz + (c0 + c1)[:, None, None] * xss * T[:, :, None]

    # ---- interior tension row ----
    # −p(1 − xs·xs_len) as a dd dot (the penalty cancellation)
    xs_len_dd = comp.dd_scale(dx1, sl)
    acc = None
    for j in range(3):
        prod = comp.dd_mul((xs_dd[0][:, :, j], xs_dd[1][:, :, j]),
                           (xs_len_dd[0][:, :, j], xs_len_dd[1][:, :, j]))
        acc = prod if acc is None else comp.dd_add(acc, prod)
    R_T = p_pen[:, None] * comp.dd_to(comp.dd_add_f(acc, -1.0))

    # D1·flow and D1·f as dd matvecs: these are the last matmuls in the
    # residual path, and on TPU a plain einsum of the FD weights loses the
    # row cancellation at ~1e-6 relative — measured as exactly the drag-gate
    # bias (constant across dt and gmres_tol) before this change
    def d1_of(v):
        h, l = comp.dd_matvec(ops.D1, jnp.moveaxis(v, 1, 2),
                              M_lo=ops_lo.D1)
        return jnp.moveaxis(comp.dd_to(comp.dd_scale((h, l), sl)), 2, 1)

    if flow is not None:
        R_T = R_T + jnp.sum(xs * d1_of(flow), axis=-1)
    if f_external is not None:
        R_T = R_T + 2.0 * c0[:, None] * jnp.sum(xs * d1_of(f_external), axis=-1)
        R_T = R_T + (c0 - c1)[:, None] * jnp.sum(xss * f_external, axis=-1)
    # −A_Tx·x (p-term already above) and −A_TT·T
    R_T = R_T + (c1 + 7.0 * c0)[:, None] * E[:, None] * jnp.sum(xss * d4x, axis=-1)
    R_T = R_T + 6.0 * c0[:, None] * E[:, None] * jnp.sum(xsss * d3x, axis=-1)
    R_T = R_T + 2.0 * c0[:, None] * dT2_l
    R_T = R_T - (c0 + c1)[:, None] * jnp.sum(xss * xss, axis=-1) * T

    R_int = jnp.concatenate(
        [R_xyz[:, :, 0], R_xyz[:, :, 1], R_xyz[:, :, 2], R_T], axis=1)
    # compensated downsample: the interior rows can be large (rough tension
    # ⇒ D2·T ~ 10²) and the plain f32 reduction's √(4n)·ε accumulation on
    # them would re-pollute the carefully-cancelled residual
    R_top = comp.dd_to(comp.dd_matvec(ops.P_downsample_bc, R_int))

    # ---- the 14 BC rows (residuals of fiber_finite_difference.cpp:347-513) ----
    v0 = v_on_fiber[:, 0, :] if v_on_fiber is not None else jnp.zeros((B, 3), dtype)
    vend = v_on_fiber[:, -1, :] if v_on_fiber is not None else jnp.zeros((B, 3), dtype)
    f0 = f_on_fiber[:, 0, :] if f_on_fiber is not None else jnp.zeros((B, 3), dtype)
    fend = f_on_fiber[:, -1, :] if f_on_fiber is not None else jnp.zeros((B, 3), dtype)
    xs0, xsend = xs[:, 0, :], xs[:, -1, :]
    xss0, xssend = xss[:, 0, :], xss[:, -1, :]
    T0, Tend = T[:, 0], T[:, -1]

    Rbc = jnp.zeros((B, 14), dtype)
    is_cl = (bc_minus == BC_MINUS_CLAMPED)
    is_hg = (bc_plus == BC_PLUS_HINGED)

    # minus rows 0-2: clamped (1−β)x₀/dt  vs  free f₀ − E·x'''₀ + xs₀·T₀
    r_cl = (one_m_beta / dt)[:, None] * block.x[:, 0, :]
    r_fr = f0 - E[:, None] * d3x[:, 0, :] + xs0 * T0[:, None]
    Rbc = Rbc.at[:, 0:3].set(jnp.where(is_cl[:, None], r_cl, r_fr))
    # minus row 3 (tension condition)
    r_cl3 = (-jnp.sum(xs0 * v0, -1) - 2.0 * c0 * jnp.sum(xs0 * f0, -1)
             - 6.0 * E * c0 * jnp.sum(xss0 * d3x[:, 0, :], -1)
             - 2.0 * c0 * dT1_l[:, 0])
    r_fr3 = (jnp.sum(f0 * xs0, -1)
             + E * jnp.sum(xss0 * d2x[:, 0, :], -1) + T0)
    Rbc = Rbc.at[:, 3].set(jnp.where(is_cl, r_cl3, r_fr3))
    # minus rows 4-6: AngularVelocity (s_prev − β·s_len)·x'₀/dt  vs Torque −x''₀
    fac = ((sp - beta[:, None, None] * sl) / dt)[:, 0, 0]
    r_av = fac[:, None] * dx1[0][:, 0, :]
    r_tq = -d2x[:, 0, :]
    Rbc = Rbc.at[:, 4:7].set(jnp.where(is_cl[:, None], r_av, r_tq))
    # plus rows 7-9: hinged (1−β)x_end/dt  vs  free f_end + E·x'''_end − xs_end·T_end
    r_hg = (one_m_beta / dt)[:, None] * block.x[:, -1, :]
    r_pf = fend + E[:, None] * d3x[:, -1, :] - xsend * Tend[:, None]
    Rbc = Rbc.at[:, 7:10].set(jnp.where(is_hg[:, None], r_hg, r_pf))
    # plus row 10
    r_hg10 = (-jnp.sum(xsend * vend, -1) - 2.0 * c0 * jnp.sum(xsend * fend, -1)
              - 6.0 * E * c0 * jnp.sum(xssend * d3x[:, -1, :], -1)
              - 2.0 * c0 * dT1_l[:, -1])
    r_pf10 = (jnp.sum(fend * xsend, -1)
              - E * jnp.sum(xssend * d2x[:, -1, :], -1) - Tend)
    Rbc = Rbc.at[:, 10].set(jnp.where(is_hg, r_hg10, r_pf10))
    # plus rows 11-13: torque −x''_end
    Rbc = Rbc.at[:, 11:14].set(-d2x[:, -1, :])

    R = jnp.concatenate([R_top, Rbc], axis=1)
    return jnp.where(block.active[:, None], R, 0.0)


def _update_cache_impl(
    block: FiberBlock,
    ops: FiberOperators,
    eta,
    dt,
    bc_minus: jax.Array,
    bc_plus: jax.Array,
    flow: Optional[jax.Array] = None,
    f_external: Optional[jax.Array] = None,
    v_on_fiber: Optional[jax.Array] = None,
    f_on_fiber: Optional[jax.Array] = None,
    ops_lo: Optional[FiberOperatorsLo] = None,
    precond_bf16: bool = False,
) -> FiberBlockCache:
    """One-shot per-step cache build: derivatives → A → RHS → BCs → LU.

    Fuses the reference's update_cache_variables + update_RHS + apply_bcs
    sequence (system.cpp:398-458) for a whole block under jit. ``ops_lo``
    (emulated mode) routes the derivative chains through double-word
    matvecs so the assembled operator's coefficients are accurate on
    backends whose matmul passes lose the FD cancellation (see
    ``derivatives``).
    """
    c0, c1 = sbt_constants(block, eta)
    xs, xss, xsss, xssss = derivatives(block, ops, ops_lo)
    A = assemble_linear_operator(block, ops, xs, xss, xsss, c0, c1, dt)
    F = assemble_force_operator(block, ops, xs, xss)
    RHS = update_rhs(block, ops, xs, xss, c0, c1, dt, flow, f_external)
    A_bc, RHS_bc = apply_boundary_conditions(
        block, ops, A, RHS, xs, xss, c0, c1, dt, bc_minus, bc_plus,
        v_on_fiber, f_on_fiber,
    )
    act = block.active
    eye = jnp.eye(A_bc.shape[1], dtype=A_bc.dtype)
    A_bc = jnp.where(act[:, None, None], A_bc, eye)
    RHS_bc = jnp.where(act[:, None], RHS_bc, 0.0)
    lu, piv = factorize(A_bc)
    if precond_bf16:
        # HBM lever for the ≥1e6-point regime: the explicit inverse is a
        # right preconditioner only (see factorize), so bf16 entry rounding
        # shifts convergence, never the solution — same argument as the
        # matrix-free shell's bf16 M_inv (periphery/shell.py). Halves the
        # (B, 4n, 4n) block, 0.95 GB at 31000×128².
        lu = lu.astype(jnp.bfloat16)
    return FiberBlockCache(
        xs=xs, xss=xss, xsss=xsss, xssss=xssss, c0=c0, c1=c1,
        A=A_bc, A_lu=lu, A_piv=piv, force_operator=F, RHS=RHS_bc,
        bc_minus=bc_minus, bc_plus=bc_plus, active=act,
    )


def update_cache(
    block: FiberBlock,
    ops: FiberOperators,
    eta,
    dt,
    bc_minus: jax.Array,
    bc_plus: jax.Array,
    flow: Optional[jax.Array] = None,
    f_external: Optional[jax.Array] = None,
    v_on_fiber: Optional[jax.Array] = None,
    f_on_fiber: Optional[jax.Array] = None,
    ops_lo: Optional[FiberOperatorsLo] = None,
    precond_bf16: bool = False,
) -> FiberBlockCache:
    """Cache build, sequenced in batch chunks above ~0.25 GB of operator.

    The ≥1e6-point regime (31000 fibers × 128-dim blocks) OOMed in the
    ASSEMBLY, not the inverse: XLA's scheduler kept seven ~1.9 GB
    [B, 4n-14, 4n] temps of the BC downsample/concat pipeline live at once
    (r4b chip log, fd_fiber.py apply_boundary_conditions). Running the whole
    derivatives → A → RHS → BC → inverse pipeline per chunk under lax.map
    bounds temps to O(chunk · (4n)²) while the per-chunk work stays batched
    MXU work; outputs are written straight into the full cache buffers.
    Numerics are identical to the unchunked path (same ops, smaller batch).
    """
    B, n = block.n_fibers, block.n_nodes
    m = 4 * n
    itemsize = jnp.dtype(block.x.dtype).itemsize
    if B * m * m * itemsize <= _FACTORIZE_CHUNK_INPUT_BYTES:
        return _update_cache_impl(
            block, ops, eta, dt, bc_minus, bc_plus, flow, f_external,
            v_on_fiber, f_on_fiber, ops_lo=ops_lo, precond_bf16=precond_bf16)

    chunk = max(1, _FACTORIZE_CHUNK_TARGET_BYTES // max(m * m * itemsize, 1))
    # prefer a chunk that DIVIDES B: the pad forces a [:B] slice on every
    # unchunked output, and XLA materializes those slices as full copies —
    # 4+ GB of pure waste at 31000×128² (r5a try2 allocations #1-#3)
    for div in range(chunk, max(chunk // 2, 1) - 1, -1):
        if B % div == 0:
            chunk = div
            break
    pad = (-B) % chunk

    def padded(a):
        if pad == 0:
            return a
        return jnp.concatenate(
            [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])])

    blk_p = jax.tree.map(padded, block)
    if pad:
        # pad rows replicate the last fiber (finite data, no div-by-zero)
        # but are marked inactive so their operator is identity
        blk_p = blk_p.replace(
            active=jnp.concatenate(
                [block.active, jnp.zeros((pad,), bool)]))

    def chunked(a):
        # explicit shapes: -1 can't infer through zero-size leaves (A_piv)
        return a.reshape((a.shape[0] // chunk, chunk) + a.shape[1:])

    mapped = {
        "block": jax.tree.map(chunked, blk_p),
        "bc_minus": chunked(padded(bc_minus)),
        "bc_plus": chunked(padded(bc_plus)),
    }
    for name, v in (("flow", flow), ("f_external", f_external),
                    ("v_on_fiber", v_on_fiber), ("f_on_fiber", f_on_fiber)):
        if v is not None:
            mapped[name] = chunked(padded(v))

    def body(c):
        return _update_cache_impl(
            c["block"], ops, eta, dt, c["bc_minus"], c["bc_plus"],
            c.get("flow"), c.get("f_external"),
            c.get("v_on_fiber"), c.get("f_on_fiber"),
            ops_lo=ops_lo, precond_bf16=precond_bf16)

    cache = jax.lax.map(body, mapped)

    def unchunk(a):
        flat = a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])
        return flat[:B] if pad else flat
    return jax.tree.map(unchunk, cache)
