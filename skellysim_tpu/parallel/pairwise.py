"""Distributed all-pairs kernel evaluation over a device mesh.

The reference's distribution of the N-body sums: sources are rank-local,
targets are everything, far-field handled by the MPI-distributed FMM
(kernels.hpp:56-134, SURVEY §2.3). The TPU-native schedule implemented here:

  * sources (and their strengths) shard across the mesh axis;
  * every device computes the partial velocity its source shard induces at
    ALL targets with the single-chip kernel (XLA fused or Pallas tiled);
  * one psum over the mesh reduces the partials — the only communication,
    3·T floats per device per evaluation, riding ICI.

This is the "partial-sum" schedule — optimal when T·3 ≪ S_local·T (always,
here). A ring schedule (ppermute of source blocks) is equivalent in comm
volume for target-sharded layouts and can be swapped in later for
memory-bound regimes.

Works identically on a virtual CPU mesh (tests, driver dryrun) and real ICI.

STATUS: validated reference schedules + benchmark utilities. The production
`System` path distributes via GSPMD from input shardings (dense tier) and
the explicit shard_map Ewald applies (kernels/ewald.far_field_apply_sharded,
kernels/ewald_near_cluster.near_apply_plan_sharded) — see
docs/distribution.md "Production path".
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from skellysim_tpu.kernels.reference import stokeslet_apply, stresslet_apply


def sharded_pairwise(mesh: Mesh, axis: str, kernel: Optional[Callable] = None):
    """Build a distributed stokeslet-apply over ``mesh``.

    Returns fn(r_src, strengths, r_trg, eta) with r_src/strengths sharded on
    ``axis`` (caller pads S to a multiple of the axis size) and r_trg
    replicated; the result is replicated.
    """
    kern = kernel if kernel is not None else stokeslet_apply

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(None), P()),
        out_specs=P(None),
    )
    def _apply(r_src_local, f_local, r_trg, eta):
        u_part = kern(r_src_local, f_local, r_trg, eta)
        return jax.lax.psum(u_part, axis)

    def apply(r_src, strengths, r_trg, eta=1.0):
        eta_arr = jnp.asarray(eta, r_trg.dtype)
        return _apply(r_src, strengths, r_trg, eta_arr)

    return apply


def pad_sources(r_src: jax.Array, strengths: jax.Array, n_devices: int):
    """Pad source count to a multiple of the mesh axis; padded strengths are
    zero so padded sources contribute nothing (coincident-point pairs are
    masked inside the kernels)."""
    S = r_src.shape[0]
    pad = (-S) % n_devices
    if pad == 0:
        return r_src, strengths
    # park padded sources far away so they are never coincident with targets
    far = jnp.full((pad, 3), 1e30, r_src.dtype)
    r_src = jnp.concatenate([r_src, far], axis=0)
    zeros = jnp.zeros((pad,) + strengths.shape[1:], strengths.dtype)
    strengths = jnp.concatenate([strengths, zeros], axis=0)
    return r_src, strengths


def ring_pairwise(mesh: Mesh, axis: str, kernel: Optional[Callable] = None):
    """Ring schedule: BOTH sources and targets shard on ``axis``.

    Each device owns a source block and a target block; source blocks rotate
    around the ring with ppermute while every device accumulates its targets'
    velocities — structurally ring attention for N-body sums (SURVEY §5
    long-context analog). Communication per evaluation is the source shard
    (vs 3·T for the partial-sum schedule): preferable when targets are many
    and sources are few per device, or when no device can hold all targets.
    """
    kern = kernel if kernel is not None else stokeslet_apply

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=P(axis),
    )
    def _apply(r_src_local, f_local, r_trg_local, eta):
        n_dev = jax.lax.axis_size(axis)

        def body(i, carry):
            u, r_blk, f_blk = carry
            u = u + kern(r_blk, f_blk, r_trg_local, eta)
            perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]
            r_blk = jax.lax.ppermute(r_blk, axis, perm)
            f_blk = jax.lax.ppermute(f_blk, axis, perm)
            return u, r_blk, f_blk

        u0 = jnp.zeros_like(r_trg_local)
        u, _, _ = jax.lax.fori_loop(0, n_dev, body, (u0, r_src_local, f_local))
        return u

    def apply(r_src, strengths, r_trg, eta=1.0):
        return _apply(r_src, strengths, r_trg, jnp.asarray(eta, r_trg.dtype))

    return apply


def sharded_stokeslet(mesh: Mesh, axis: str = "fib", kernel=None):
    base = sharded_pairwise(mesh, axis, kernel or stokeslet_apply)
    n = mesh.shape[axis]

    def apply(r_src, f_src, r_trg, eta=1.0):
        r_p, f_p = pad_sources(r_src, f_src, n)
        return base(r_p, f_p, r_trg, eta)

    return apply


def sharded_stresslet(mesh: Mesh, axis: str = "fib", kernel=None):
    base = sharded_pairwise(mesh, axis, kernel or stresslet_apply)
    n = mesh.shape[axis]

    def apply(r_src, S_src, r_trg, eta=1.0):
        r_p, s_p = pad_sources(r_src, S_src, n)
        return base(r_p, s_p, r_trg, eta)

    return apply
