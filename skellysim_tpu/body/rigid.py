"""Rigid bodies (spheres, ellipsoids) as completed second-kind boundary
integral surfaces with rigid-body motion unknowns.

Runtime counterpart of the reference's SphericalBody/EllipsoidalBody
(src/core/body_spherical.cpp, body_ellipsoidal.cpp). Per-body solution layout
is [3n node densities | U (3) | Ω (3)] (body_spherical.hpp:61). The operator
is the completed double-layer formulation:

  node rows:  −Σ_k e_k(i) σ_k(i)/w_i − (K [U; Ω])_i + v_i
  com rows:   −Kᵀ σ + [U; Ω]

with e_k the singularity-subtraction vectors (body_spherical.cpp:168-181), K
the rigid-motion map K[U;Ω] = U + Ω×(r−c) (body_spherical.cpp:74-86), and the
body↔everything stresslet flow arriving through the global pairwise kernel
evaluation. The dense preconditioner A adds the body's own stresslet×normal
block (body_spherical.cpp:104-127).

Shape specifics (collision checks, quadrature geometry) live in host
metadata; everything traced is shape-agnostic.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from skellysim_tpu.kernels.reference import (
    stresslet_times_normal,
    stresslet_times_normal_times_density,
)
from skellysim_tpu.utils.quaternion import quat_multiply, quat_rotate, quat_from_rotvec


@struct.dataclass
class RigidBodyState:
    position: jax.Array            # (3,)
    orientation: jax.Array         # (4,) w, x, y, z
    node_positions_ref: jax.Array  # (n, 3) body frame
    node_normals_ref: jax.Array    # (n, 3)
    nucleation_sites_ref: jax.Array  # (S, 3)
    node_weights: jax.Array        # (n,)
    solution: jax.Array            # (3n + 6,)
    velocity: jax.Array            # (3,)
    angular_velocity: jax.Array    # (3,)
    external_force: jax.Array      # (3,)
    external_torque: jax.Array     # (3,)
    osc_amplitude: jax.Array       # () oscillatory-force parameters
    osc_omega: jax.Array
    osc_phase: jax.Array

    @property
    def n_nodes(self) -> int:
        return self.node_positions_ref.shape[0]

    @property
    def solution_size(self) -> int:
        return 3 * self.n_nodes + 6


@struct.dataclass
class RigidBodyCache:
    node_positions: jax.Array  # (n, 3) lab frame
    node_normals: jax.Array    # (n, 3)
    nucleation_sites: jax.Array  # (S, 3)
    e_sub: jax.Array           # (3, n, 3) singularity-subtraction vectors
    K: jax.Array               # (3n, 6)
    A_lu: jax.Array            # (3n+6, 3n+6) LU factors of the dense operator
    A_piv: jax.Array


class RigidBody:
    """Host wrapper: shape metadata + state pytree."""

    def __init__(self, state: RigidBodyState, shape: str, radius=0.0,
                 axes=(0.0, 0.0, 0.0), external_force_type: str = "Linear"):
        self.state = state
        self.shape = shape                  # "sphere" | "ellipsoid"
        self.radius = float(radius)
        self.axes = tuple(axes)
        self.external_force_type = external_force_type

    @staticmethod
    def from_table(body_table: dict, dtype=jnp.float64) -> "RigidBody":
        """Build from a config table + precompute npz (body_spherical.cpp:213-275)."""
        data = np.load(body_table["precompute_file"])
        n = data["node_positions_ref"].shape[0]
        pos = np.asarray(body_table.get("position", [0.0, 0.0, 0.0]), np.float64)
        quat = np.asarray(body_table.get("orientation", [0.0, 0.0, 0.0, 1.0]), np.float64)
        # config stores xyzw (scipy convention, skelly_config.py Body default);
        # internally we use wxyz
        orientation = np.array([quat[3], quat[0], quat[1], quat[2]])
        sites = np.asarray(body_table.get("nucleation_sites", []), np.float64).reshape(-1, 3)
        shape = body_table.get("shape", "sphere")
        ftype = body_table.get("external_force_type", "Linear")
        state = RigidBodyState(
            position=jnp.asarray(pos, dtype),
            orientation=jnp.asarray(orientation, dtype),
            node_positions_ref=jnp.asarray(data["node_positions_ref"], dtype),
            node_normals_ref=jnp.asarray(data["node_normals_ref"], dtype),
            nucleation_sites_ref=jnp.asarray(sites, dtype),
            node_weights=jnp.asarray(data["node_weights"], dtype),
            solution=jnp.zeros(3 * n + 6, dtype),
            velocity=jnp.zeros(3, dtype),
            angular_velocity=jnp.zeros(3, dtype),
            external_force=jnp.asarray(body_table.get("external_force", [0, 0, 0]), dtype),
            external_torque=jnp.asarray(body_table.get("external_torque", [0, 0, 0]), dtype),
            osc_amplitude=jnp.asarray(
                body_table.get("external_oscillation_force_amplitude", 0.0), dtype),
            osc_omega=jnp.asarray(
                2.0 * np.pi * body_table.get("external_oscillation_force_frequency", 0.0),
                dtype),
            osc_phase=jnp.asarray(
                body_table.get("external_oscillation_force_phase", 0.0), dtype),
        )
        return RigidBody(state, shape=shape,
                         radius=float(body_table.get("radius", 0.0)),
                         axes=tuple(body_table.get("axis_length", [0.0, 0.0, 0.0])),
                         external_force_type=ftype)


# ---- pure jit-safe operations ----

def place(state: RigidBodyState):
    """Lab-frame node positions/normals/sites (body_spherical.cpp:146-159)."""
    q = state.orientation
    rot = lambda v: quat_rotate(q, v)
    nodes = state.position[None, :] + jax.vmap(rot)(state.node_positions_ref)
    normals = jax.vmap(rot)(state.node_normals_ref)
    sites = (state.position[None, :] + jax.vmap(rot)(state.nucleation_sites_ref)
             if state.nucleation_sites_ref.shape[0] else state.nucleation_sites_ref)
    return nodes, normals, sites


def update_cache(state: RigidBodyState, eta) -> RigidBodyCache:
    """Per-step dense operators (SphericalBody::update_cache_variables)."""
    nodes, normals, sites = place(state)
    n = state.n_nodes
    w = state.node_weights

    # singularity-subtraction vectors e_k = T[n ⊗ (w e_k)] (cpp:168-181)
    def e_vec(k):
        e = jnp.zeros((n, 3), nodes.dtype).at[:, k].set(w)
        return stresslet_times_normal_times_density(nodes, normals, e)

    e_sub = jnp.stack([e_vec(0), e_vec(1), e_vec(2)])

    # K: rigid motion map, K @ [U; Ω] = U + Ω × (r − c) (cpp:74-86)
    d = nodes - state.position[None, :]
    zeros = jnp.zeros(n, nodes.dtype)
    # row i (3 rows): [I₃ | −skew(d_i)]
    neg_skew = jnp.stack([
        jnp.stack([zeros, d[:, 2], -d[:, 1]], axis=-1),
        jnp.stack([-d[:, 2], zeros, d[:, 0]], axis=-1),
        jnp.stack([d[:, 1], -d[:, 0], zeros], axis=-1),
    ], axis=1)  # (n, 3, 3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=nodes.dtype), (n, 3, 3))
    K = jnp.concatenate([eye, neg_skew], axis=-1).reshape(3 * n, 6)

    # dense preconditioner (cpp:104-127)
    A = jnp.zeros((3 * n + 6, 3 * n + 6), nodes.dtype)
    A = A.at[:3 * n, :3 * n].set(stresslet_times_normal(nodes, normals))
    for k in range(3):
        cols = 3 * jnp.arange(n) + k
        block = -(e_sub[k] / w[:, None])          # (n, 3) values for node i
        A = A.at[3 * jnp.arange(n)[:, None] + jnp.arange(3)[None, :],
                 cols[:, None]].add(block)
    A = A.at[:3 * n, 3 * n:].set(-K)
    A = A.at[3 * n:, :3 * n].set(-K.T)
    A = A.at[3 * n + jnp.arange(6), 3 * n + jnp.arange(6)].set(1.0)
    # LU, not an explicit inverse: the body operator can be numerically
    # singular along rotation-adjacent modes (the prolate axial-rotation
    # gate diverges with inv()); lu_solve's structured factors still
    # precondition well. One body is a single (3n+6) solve per iteration —
    # cheap next to the fiber block (which DOES use batched inverses).
    lu, piv = jax.scipy.linalg.lu_factor(A)
    return RigidBodyCache(node_positions=nodes, node_normals=normals,
                          nucleation_sites=sites, e_sub=e_sub, K=K,
                          A_lu=lu, A_piv=piv)


def geometry_cache(state: RigidBodyState) -> RigidBodyCache:
    """Placement-only cache (no dense operators) for flow/analysis paths."""
    nodes, normals, sites = place(state)
    z = jnp.zeros((0,), nodes.dtype)
    return RigidBodyCache(node_positions=nodes, node_normals=normals,
                          nucleation_sites=sites, e_sub=z, K=z,
                          A_lu=z, A_piv=jnp.zeros((0,), jnp.int32))


def matvec(state: RigidBodyState, cache: RigidBodyCache, v_nodes: jax.Array,
           x_body: jax.Array) -> jax.Array:
    """Body block-row of the global operator (body_spherical.cpp:39-63)."""
    n = state.n_nodes
    d = x_body[:3 * n].reshape(n, 3)
    U = x_body[3 * n:]
    # c = Σ_k e_k(i) d_k(i) / w_i
    c = jnp.einsum("kni,nk->ni", cache.e_sub, d / state.node_weights[:, None])
    KU = (cache.K @ U).reshape(n, 3)
    res_nodes = -c - KU + v_nodes
    res_com = -(cache.K.T @ x_body[:3 * n]) + U
    return jnp.concatenate([res_nodes.reshape(-1), res_com])


def precondition(cache: RigidBodyCache, x: jax.Array) -> jax.Array:
    return jax.scipy.linalg.lu_solve((cache.A_lu, cache.A_piv), x)


def update_rhs(v_nodes: jax.Array) -> jax.Array:
    """[−v; 0₆] (body_spherical.cpp:134-138)."""
    return jnp.concatenate([-v_nodes.reshape(-1), jnp.zeros(6, v_nodes.dtype)])


def step(state: RigidBodyState, body_solution: jax.Array, dt) -> RigidBodyState:
    """Advance position/orientation from the solved motion (cpp:13-35)."""
    n = state.n_nodes
    velocity = body_solution[3 * n:3 * n + 3]
    omega = body_solution[3 * n + 3:3 * n + 6]
    new_pos = state.position + velocity * dt
    dq = quat_from_rotvec(omega * dt)
    new_q = quat_multiply(dq, state.orientation)
    return state.replace(position=new_pos, orientation=new_q,
                         velocity=velocity, angular_velocity=omega,
                         solution=body_solution)


def external_force_torque(state: RigidBodyState, force_type: str, time) -> jax.Array:
    """(6,) external force+torque (BodyContainer::calculate_external_forces_torques)."""
    if force_type == "Oscillatory":
        f = (state.osc_amplitude
             * jnp.sin(state.osc_omega * time - state.osc_phase)) * state.external_force
    else:
        f = state.external_force
    return jnp.concatenate([f, state.external_torque])


class DeformableBody:
    """Placeholder matching the reference's DeformableBody stub
    (include/body_deformable.hpp, src/core/body_deformable.cpp — all methods
    are no-ops there and its flow path throws). Config tables with
    shape="deformable" construct this and raise on use in a solve."""

    def __init__(self, body_table: dict):
        self.table = body_table

    def __getattr__(self, name):
        raise NotImplementedError(
            "DeformableBody is a stub (as in the reference); no dynamics are "
            "implemented")
