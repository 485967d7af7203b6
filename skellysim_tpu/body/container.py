"""Container coordinating rigid bodies: flows, link conditions, block ops.

Counterpart of the reference's BodyContainer (src/core/body_container.cpp).
Bodies are few and small (n ≈ 600–800 nodes), so each keeps its own dense
operators; container ops are short static loops. The physics-critical piece
is the fiber↔body coupling ("link conditions",
body_container.cpp:170-267): attached fibers exert force/torque on their
body's center, and the body's rigid motion imposes velocity constraints on
the fiber's clamped end — both entering the global operator every GMRES
iteration.

Unlike the reference (bodies resident on MPI rank 0, solutions broadcast),
body state is replicated across devices — the DOF count is tiny and
replication removes all communication.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from skellysim_tpu.body import rigid
from skellysim_tpu.body.rigid import RigidBody, RigidBodyCache, RigidBodyState
from skellysim_tpu.kernels.reference import rotlet_apply, stokeslet_apply, stresslet_apply


class BodyContainer:
    """Host wrapper holding the body list + static metadata."""

    def __init__(self, bodies: List[RigidBody]):
        self.bodies = bodies

    @staticmethod
    def from_tables(body_tables: List[dict], dtype=None) -> "BodyContainer":
        import jax.numpy as jnp

        dtype = dtype if dtype is not None else jnp.float64
        for t in body_tables:
            if t.get("shape") == "deformable":
                raise NotImplementedError(
                    "deformable bodies are a stub in the reference and here")
        return BodyContainer([RigidBody.from_table(t, dtype=dtype)
                              for t in body_tables])

    @property
    def n_bodies(self) -> int:
        return len(self.bodies)

    @property
    def node_count(self) -> int:
        return sum(b.state.n_nodes for b in self.bodies)

    @property
    def solution_size(self) -> int:
        return sum(b.state.solution_size for b in self.bodies)

    def states(self) -> List[RigidBodyState]:
        return [b.state for b in self.bodies]

    def set_states(self, states: List[RigidBodyState]) -> None:
        for b, s in zip(self.bodies, states):
            b.state = s

    def force_types(self) -> List[str]:
        return [b.external_force_type for b in self.bodies]

    def max_sites(self) -> int:
        return max([b.state.nucleation_sites_ref.shape[0] for b in self.bodies] + [1])


# ---- pure jit-safe container ops ----

def update_caches(states: List[RigidBodyState], eta) -> List[RigidBodyCache]:
    return [rigid.update_cache(s, eta) for s in states]


def positions(caches: List[RigidBodyCache]) -> jax.Array:
    if not caches:
        return jnp.zeros((0, 3))
    return jnp.concatenate([c.node_positions for c in caches], axis=0)


def split_solution(states, x: jax.Array) -> List[jax.Array]:
    out, o = [], 0
    for s in states:
        out.append(x[o:o + s.solution_size])
        o += s.solution_size
    return out


def split_nodes(states, arr: jax.Array) -> List[jax.Array]:
    out, o = [], 0
    for s in states:
        out.append(arr[o:o + s.n_nodes])
        o += s.n_nodes
    return out


def matvec(states, caches, v_nodes: jax.Array, x_bodies: jax.Array) -> jax.Array:
    parts = []
    for s, c, v, xb in zip(states, caches, split_nodes(states, v_nodes),
                           split_solution(states, x_bodies)):
        parts.append(rigid.matvec(s, c, v, xb))
    return jnp.concatenate(parts) if parts else jnp.zeros(0, x_bodies.dtype)


def precondition(states, caches, x_bodies: jax.Array) -> jax.Array:
    parts = [rigid.precondition(c, xb)
             for c, xb in zip(caches, split_solution(states, x_bodies))]
    return jnp.concatenate(parts) if parts else jnp.zeros(0, x_bodies.dtype)


def rhs(states, v_nodes: jax.Array) -> jax.Array:
    parts = [rigid.update_rhs(v)
             for s, v in zip(states, split_nodes(states, v_nodes))]
    return jnp.concatenate(parts) if parts else jnp.zeros(0, v_nodes.dtype)


def step(states, x_bodies: jax.Array, dt) -> List[RigidBodyState]:
    return [rigid.step(s, xb, dt)
            for s, xb in zip(states, split_solution(states, x_bodies))]


def external_forces_torques(states, force_types: List[str], time) -> jax.Array:
    """(n_bodies, 6) external forces/torques (body_container.cpp:413-447)."""
    if not states:
        return jnp.zeros((0, 6))
    return jnp.stack([rigid.external_force_torque(s, t, time)
                      for s, t in zip(states, force_types)])


def flow(states, caches, r_trg: jax.Array, x_bodies: jax.Array,
         forces_torques: jax.Array, eta, evaluator_stresslet=None,
         evaluator_stokeslet=None) -> jax.Array:
    """Velocity at targets from all bodies (body_container.cpp:269-411):
    double layer of node densities + stokeslet(center forces) +
    rotlet(center torques)."""
    if not states:
        return jnp.zeros_like(r_trg)
    nodes = positions(caches)
    normals = jnp.concatenate([c.node_normals for c in caches], axis=0)
    densities = jnp.concatenate(
        [xb[:3 * s.n_nodes].reshape(-1, 3)
         for s, xb in zip(states, split_solution(states, x_bodies))], axis=0)
    S = 2.0 * eta * normals[:, :, None] * densities[:, None, :]
    ev_str = evaluator_stresslet if evaluator_stresslet is not None else stresslet_apply
    ev_stk = evaluator_stokeslet if evaluator_stokeslet is not None else stokeslet_apply
    u = ev_str(nodes, S, r_trg, eta)
    centers = jnp.stack([s.position for s in states])
    u = u + ev_stk(centers, forces_torques[:, :3], r_trg, eta)
    u = u + rotlet_apply(centers, forces_torques[:, 3:], r_trg, eta)
    return u


def stacked_site_data(states, caches, max_sites: int):
    """(n_bodies, S_max, 3) lab-frame nucleation sites + (n_bodies, 3) centers."""
    sites = []
    for s, c in zip(states, caches):
        S = c.nucleation_sites.shape[0]
        pad = max_sites - S
        padded = jnp.pad(c.nucleation_sites, ((0, pad), (0, 0))) if S else \
            jnp.zeros((max_sites, 3), s.position.dtype)
        sites.append(padded)
    centers = jnp.stack([s.position for s in states])
    return jnp.stack(sites), centers


def link_conditions(fiber_blocks, fiber_ops, fiber_caches, x_fib_split,
                    x_bodies: jax.Array, states, caches, max_sites: int
                    ) -> Tuple[List[jax.Array], jax.Array]:
    """Fiber↔body coupling (body_container.cpp:170-267).

    Returns (per-block (B, 7) velocities-on-fiber, (n_bodies, 6) body
    forces/torques). The 7 fiber values fill the clamped-end BC rows:
    [−U − Ω×site (3) | tension condition (1) | site-normal×Ω (3)].
    """
    n_bodies = len(states)
    sites_all, centers = stacked_site_data(states, caches, max_sites)
    # body velocities from the solution vector
    UW = jnp.stack([xb[3 * s.n_nodes:]
                    for s, xb in zip(states, split_solution(states, x_bodies))])

    v_on_fiber_blocks = []
    ft_total = jnp.zeros((n_bodies, 6), x_bodies.dtype)
    for blk, ops, cache, xf in zip(fiber_blocks, fiber_ops, fiber_caches, x_fib_split):
        B, n = blk.n_fibers, blk.n_nodes
        attached = blk.binding_body >= 0
        bidx = jnp.clip(blk.binding_body, 0, n_bodies - 1)
        sidx = jnp.clip(blk.binding_site, 0, max_sites - 1)
        site_lab = sites_all[bidx, sidx]                      # (B, 3)
        site_rel = site_lab - centers[bidx]

        sol = xf.reshape(B, 4, n)
        x_new = sol[:, :3, :].transpose(0, 2, 1)              # (B, n, 3)
        T0 = sol[:, 3, 0]
        s2 = (2.0 / blk.length) ** 2
        s3 = (2.0 / blk.length) ** 3
        xss0 = s2[:, None] * jnp.einsum("m,bmc->bc", ops.D2[0], x_new)
        xsss0 = s3[:, None] * jnp.einsum("m,bmc->bc", ops.D3[0], x_new)
        xs0 = cache.xs[:, 0, :]
        E = blk.bending_rigidity

        F_body = -E[:, None] * xsss0 + xs0 * T0[:, None]
        L_body = (-E[:, None] * jnp.cross(site_rel, xsss0)
                  + jnp.cross(site_rel, xs0) * T0[:, None]
                  + E[:, None] * jnp.cross(xs0, xss0))
        ft = jnp.where(attached[:, None], jnp.concatenate([F_body, L_body], axis=1), 0.0)
        ft_total = ft_total + jax.ops.segment_sum(ft, bidx, num_segments=n_bodies)

        v_body = UW[bidx, :3]
        w_body = UW[bidx, 3:]
        v_fiber = -v_body - jnp.cross(w_body, site_rel)
        tension_cond = (-jnp.einsum("bc,bc->b", xs0, v_body)
                        + jnp.einsum("bc,bc->b", jnp.cross(xs0, site_rel), w_body))
        site_hat = site_rel / jnp.maximum(
            jnp.linalg.norm(site_rel, axis=-1, keepdims=True), 1e-300)
        w_fiber = jnp.cross(site_hat, w_body)
        v7 = jnp.concatenate([v_fiber, tension_cond[:, None], w_fiber], axis=1)
        v_on_fiber_blocks.append(jnp.where(attached[:, None], v7, 0.0))

    return v_on_fiber_blocks, ft_total


def lab_site_data(states, max_sites: int):
    """Lab-frame nucleation sites straight from body state (no dense caches)."""
    sites, centers = [], []
    for s in states:
        _, _, lab = rigid.place(s)
        S = lab.shape[0]
        padded = (jnp.pad(lab, ((0, max_sites - S), (0, 0))) if S
                  else jnp.zeros((max_sites, 3), s.position.dtype))
        sites.append(padded)
        centers.append(s.position)
    return jnp.stack(sites), jnp.stack(centers)


def repin_fibers(fiber_blocks, states, max_sites: int):
    """Translate attached fibers so their minus end sits exactly on its
    nucleation site (fiber_container_finite_difference.cpp:308-316)."""
    if not states:
        return fiber_blocks
    sites_all, centers = lab_site_data(states, max_sites)
    n_bodies = len(states)
    out = []
    for blk in fiber_blocks:
        attached = blk.binding_body >= 0
        bidx = jnp.clip(blk.binding_body, 0, n_bodies - 1)
        sidx = jnp.clip(blk.binding_site, 0, max_sites - 1)
        site_lab = sites_all[bidx, sidx]
        delta = jnp.where(attached[:, None], site_lab - blk.x[:, 0, :], 0.0)
        # fold the rigid translation into the double-word position so
        # emulated-precision runs don't re-round |x|-scale values each repin
        from skellysim_tpu.utils import compensated as comp

        xh, xl = comp.dd_add_f((blk.x, blk.x_lo), delta[:, None, :])
        out.append(blk.replace(x=xh, x_lo=xl))
    return out
