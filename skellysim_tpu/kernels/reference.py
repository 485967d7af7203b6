"""Pure-XLA pairwise Stokes kernels — the reference/oracle implementations.

These are written as broadcast dense contractions so XLA can fuse and tile
them; they run in whatever dtype the inputs carry (f64 for the tight-tolerance
solve path, f32 for speed). The Pallas kernels in
:mod:`skellysim_tpu.kernels.pallas_tpu` are validated against these, mirroring
how the reference validates GPU/FMM drivers against the single-threaded CPU
evaluator (tests/core/kernel_test.cpp:40-54).

Math parity targets (formulas re-derived, layouts re-designed):
  * stokeslet (Oseen tensor) apply: src/core/kernels.cpp:54-67 and the PVFMM
    stokes_vel micro-kernel — u = (1/8πη) Σ [f/r + (d·f) d/r³]
  * stresslet ("double-layer velocity") apply: src/core/kernels.cpp:11-40 —
    u = (-3/8πη) Σ (d·S·d) d/r⁵ with S a 3×3 per-source tensor
  * rotlet apply: src/core/kernels.cpp:206-242 — u = (1/8πη) Σ (g×d)/r³
  * dense Oseen matrix builder (regularized): src/core/kernels.cpp:146-195
  * stresslet×normal dense operator and its density contraction:
    src/core/kernels.cpp:264-334

Array layout is node-major: positions/forces are (N, 3); double-layer
strengths are (N, 3, 3). d = r_trg - r_src throughout.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_INV_8PI = 1.0 / (8.0 * jnp.pi)


def _pairwise_disp(r_trg: jax.Array, r_src: jax.Array):
    """d[t, s, :] = r_trg[t] - r_src[s]; returns (d, r², nonzero-mask)."""
    d = r_trg[:, None, :] - r_src[None, :, :]
    r2 = jnp.sum(d * d, axis=-1)
    mask = r2 > 0.0
    return d, r2, mask


@functools.partial(jax.jit, static_argnames=("target_chunk",))
def stokeslet_apply(
    r_src: jax.Array,
    f_src: jax.Array,
    r_trg: jax.Array,
    eta: float | jax.Array = 1.0,
    target_chunk: Optional[int] = None,
) -> jax.Array:
    """Velocity at targets from point forces (single-layer Stokes kernel).

    u_t = 1/(8πη) Σ_s [ f_s / r + (d·f_s) d / r³ ],  d = r_t - r_s.
    Self-interactions (r = 0) contribute zero.

    ``target_chunk`` bounds the (T, S) intermediate by mapping over target
    blocks — use for large problems on the XLA path.
    """
    if target_chunk is not None and r_trg.shape[0] > target_chunk:
        return _chunked_over_targets(
            lambda rt: stokeslet_apply(r_src, f_src, rt, eta), r_trg, target_chunk
        )
    d, r2, mask = _pairwise_disp(r_trg, r_src)
    rinv = jnp.where(mask, jax.lax.rsqrt(jnp.where(mask, r2, 1.0)), 0.0)
    rinv3 = rinv * rinv * rinv
    df = jnp.einsum("tsi,si->ts", d, f_src)
    u = jnp.einsum("ts,si->ti", rinv, f_src) + jnp.einsum("ts,tsi->ti", df * rinv3, d)
    return u * (_INV_8PI / eta)


@functools.partial(jax.jit, static_argnames=("target_chunk",))
def stresslet_apply(
    r_src: jax.Array,
    S_src: jax.Array,
    r_trg: jax.Array,
    eta: float | jax.Array = 1.0,
    target_chunk: Optional[int] = None,
) -> jax.Array:
    """Velocity at targets from 3×3 double-layer strengths S (stresslet).

    u_t = -3/(8πη) Σ_s (d·S_s·d) d / r⁵.

    The physical double-layer density of a surface with normal n and vector
    density q enters as S = 2η n⊗q (see Periphery::flow,
    src/core/periphery.cpp:61-74), which cancels the 1/η here and yields the
    classic -3/(4π) (d·q)(d·n) d/r⁵ stresslet.
    """
    if target_chunk is not None and r_trg.shape[0] > target_chunk:
        return _chunked_over_targets(
            lambda rt: stresslet_apply(r_src, S_src, rt, eta), r_trg, target_chunk
        )
    d, r2, mask = _pairwise_disp(r_trg, r_src)
    rinv = jnp.where(mask, jax.lax.rsqrt(jnp.where(mask, r2, 1.0)), 0.0)
    rinv5 = rinv * rinv * rinv * rinv * rinv
    dSd = jnp.einsum("tsi,sij,tsj->ts", d, S_src, d)
    u = jnp.einsum("ts,tsi->ti", -3.0 * dSd * rinv5, d)
    return u * (_INV_8PI / eta)


@functools.partial(jax.jit, static_argnames=("target_chunk",))
def rotlet_apply(
    r_src: jax.Array,
    g_src: jax.Array,
    r_trg: jax.Array,
    eta: float | jax.Array = 1.0,
    reg: float = 5e-3,
    epsilon_distance: float = 1e-10,
    target_chunk: Optional[int] = None,
) -> jax.Array:
    """Velocity at targets from point torques: u = 1/(8πη) Σ (g×d)/r³.

    Distances below ``epsilon_distance`` are softened with ``reg`` the same
    way the reference regularizes (src/core/kernels.cpp:225).
    """
    if target_chunk is not None and r_trg.shape[0] > target_chunk:
        return _chunked_over_targets(
            lambda rt: rotlet_apply(r_src, g_src, rt, eta, reg, epsilon_distance),
            r_trg,
            target_chunk,
        )
    d, r2, _ = _pairwise_disp(r_trg, r_src)
    r2 = jnp.where(r2 < epsilon_distance**2, r2 + reg * reg, r2)
    mask = r2 > 0.0
    rinv = jnp.where(mask, jax.lax.rsqrt(jnp.where(mask, r2, 1.0)), 0.0)
    gxd = jnp.cross(g_src[None, :, :], d)
    u = jnp.einsum("ts,tsi->ti", rinv**3, gxd)
    return u * (_INV_8PI / eta)


def _chunked_over_targets(fn, r_trg, chunk):
    n = r_trg.shape[0]
    pad = (-n) % chunk
    rt = jnp.pad(r_trg, ((0, pad), (0, 0)))
    blocks = rt.reshape(-1, chunk, 3)
    out = jax.lax.map(fn, blocks)
    return out.reshape(-1, 3)[:n]


@jax.jit
def oseen_tensor(
    r_src: jax.Array,
    r_trg: jax.Array,
    eta: float | jax.Array = 1.0,
    reg: float = 5e-3,
    epsilon_distance: float = 1e-10,
) -> jax.Array:
    """Dense (3T, 3S) mobility matrix G of stokeslets ("Oseen tensor").

    G[3t:3t+3, 3s:3s+3] = f(r) I + g(r) d dᵀ with f = 1/(8πη r),
    g = 1/(8πη r³); pairs closer than ``epsilon_distance`` are regularized by
    ``reg`` and exactly coincident pairs are zero. Used for the per-fiber
    self-interaction block (reference: Fiber::update_stokeslet →
    kernels::oseen_tensor_direct, src/core/kernels.cpp:146-195).
    """
    T, S = r_trg.shape[0], r_src.shape[0]
    d = r_trg[:, None, :] - r_src[None, :, :]
    r2 = jnp.sum(d * d, axis=-1)
    nonzero = r2 > 0.0
    near = jnp.sqrt(jnp.where(nonzero, r2, 1.0)) <= epsilon_distance
    r2_eff = jnp.where(near, r2 + reg * reg, r2)
    rinv = jnp.where(nonzero, jax.lax.rsqrt(jnp.where(nonzero, r2_eff, 1.0)), 0.0)
    factor = _INV_8PI / eta
    fr = factor * rinv
    gr = factor * rinv**3
    eye = jnp.eye(3, dtype=r_src.dtype)
    blocks = fr[:, :, None, None] * eye + gr[:, :, None, None] * d[:, :, :, None] * d[:, :, None, :]
    return blocks.transpose(0, 2, 1, 3).reshape(3 * T, 3 * S)


@jax.jit
def stresslet_times_normal(
    r: jax.Array,
    normals: jax.Array,
    reg: float = 5e-3,
    epsilon_distance: float = 1e-10,
) -> jax.Array:
    """Dense (3N, 3N) operator of the stresslet contracted with surface normals.

    Block(i, j) = -3/(4π) (d·n_j) / r⁵ · d dᵀ, d = r_i - r_j, zero diagonal.
    Viscosity-independent (reference: kernels::stresslet_times_normal,
    src/core/kernels.cpp:264-287). Assembles rigid-body / periphery
    second-kind operators.
    """
    N = r.shape[0]
    d = r[:, None, :] - r[None, :, :]
    r2 = jnp.sum(d * d, axis=-1)
    nonzero = r2 > 0.0
    near = jnp.sqrt(jnp.where(nonzero, r2, 1.0)) < epsilon_distance
    r2_eff = jnp.where(near, r2 + reg * reg, r2)
    rinv = jnp.where(nonzero, jax.lax.rsqrt(jnp.where(nonzero, r2_eff, 1.0)), 0.0)
    dn = jnp.einsum("ijk,jk->ij", d, normals)
    coeff = (-3.0 / (4.0 * jnp.pi)) * dn * rinv**5
    blocks = coeff[:, :, None, None] * d[:, :, :, None] * d[:, :, None, :]
    return blocks.transpose(0, 2, 1, 3).reshape(3 * N, 3 * N)


@jax.jit
def stresslet_times_normal_times_density(
    r: jax.Array,
    normals: jax.Array,
    density: jax.Array,
    reg: float = 5e-3,
    epsilon_distance: float = 1e-10,
) -> jax.Array:
    """(N, 3) contraction: S_i = -3/(4π) Σ_{j≠i} (d·q_j)(d·n_j) d / r⁵.

    Reference: kernels::stresslet_times_normal_times_density,
    src/core/kernels.cpp:307-334 (used for rigid-body singularity
    subtraction vectors).
    """
    d = r[:, None, :] - r[None, :, :]
    r2 = jnp.sum(d * d, axis=-1)
    nonzero = r2 > 0.0
    near = jnp.sqrt(jnp.where(nonzero, r2, 1.0)) < epsilon_distance
    r2_eff = jnp.where(near, r2 + reg * reg, r2)
    rinv = jnp.where(nonzero, jax.lax.rsqrt(jnp.where(nonzero, r2_eff, 1.0)), 0.0)
    dq = jnp.einsum("ijk,jk->ij", d, density)
    dn = jnp.einsum("ijk,jk->ij", d, normals)
    coeff = dq * dn * rinv**5
    u = jnp.einsum("ij,ijk->ik", coeff, d)
    return (-3.0 / (4.0 * jnp.pi)) * u
