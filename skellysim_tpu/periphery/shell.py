"""Confining periphery (cell cortex) as a second-kind boundary-integral surface.

Runtime counterpart of the reference's Periphery classes
(include/periphery.hpp, src/core/periphery.cpp): the dense operators come
from the offline precompute (skellysim_tpu.precompute); at runtime the shell
contributes

  * preconditioner apply:   y = M⁻¹ x                    (periphery.cpp:21-29)
  * operator apply:         y = (T − E − I/w + nnᵀ) x + v (periphery.cpp:38-47)
  * flow at targets:        double layer with S = 2η n⊗q  (periphery.cpp:55-79)
  * RHS:                    −v at shell nodes             (periphery.cpp:86)
  * shape-aware collision checks and exponential steric repulsion on fibers
    (periphery.cpp:94-263)

TPU mapping: both dense (3N, 3N) operators are plain matmuls — MXU work. For
multi-chip runs they shard by rows with the solution vector all-gathered,
exactly the layout the reference reaches with Scatterv/Allgatherv; on one
chip they stay resident in HBM (N ≤ 10⁴ → ≤ 7.2 GB f64 for both).
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from skellysim_tpu.kernels.reference import stresslet_apply

SHAPE_NONE = "none"
SHAPE_SPHERE = "sphere"
SHAPE_ELLIPSOID = "ellipsoid"
SHAPE_GENERIC = "generic"


@struct.dataclass
class ShellState:
    """Device-resident periphery data (pytree).

    The dense operators may be stored in either index convention:
      * node-major (interleaved [x0 y0 z0 x1 …]) — the reference layout,
        what the offline precompute npz carries
      * component-major ("blocked": [all-x | all-y | all-z]) — TPU-friendly:
        every assembly intermediate is (N, N), avoiding Mosaic's catastrophic
        lane padding of trailing length-3 axes. Applies permute in/out with
        O(N) reshapes.
    """

    nodes: jax.Array        # (N, 3)
    normals: jax.Array      # (N, 3) inward-pointing (into the domain)
    weights: jax.Array      # (N,)
    M_inv: jax.Array        # (3N, 3N); bf16 in matrix-free mode (it is only
                            # a preconditioner — entry rounding shifts
                            # convergence, never the solution)
    A: jax.Array            # (3N, 3N) stresslet + complementary operator,
                            # or None in MATRIX-FREE mode: the operator's
                            # action is one dense pairwise stresslet apply
                            # (the Pallas kernel) + O(N) corrections — at
                            # large N the kernel is as fast as streaming the
                            # stored matrix from HBM and saves (3N)²·4 B
                            # per operator (the 788k-DOF OOM: 2 × 1.6 GB)
    solution: jax.Array     # (3N,) current density solution (node-major)
    blocked: bool = struct.field(pytree_node=False, default=False)
    e_sub: jax.Array = None  # (3, 3, N) singularity-subtraction vectors
                             # (only needed by the matrix-free apply)

    @property
    def n_nodes(self) -> int:
        return self.nodes.shape[0]

    @property
    def solution_size(self) -> int:
        return 3 * self.n_nodes


class Shell:
    """Host wrapper: shape metadata + the ShellState pytree."""

    def __init__(self, state: ShellState, shape: str = SHAPE_GENERIC,
                 radius: float = 0.0, abc=(0.0, 0.0, 0.0),
                 meridian: np.ndarray = None):
        self.state = state
        self.shape = shape
        self.radius = radius
        self.abc = tuple(abc)
        # (2, S+1) meridian polyline for surface-of-revolution walls; the
        # runtime interaction geometry (collision/repulsion/binding)
        self.meridian = meridian
        # shape-less precompute npz: derive effective (a, b, c) from the
        # node extents like the reference's GenericPeriphery
        # (periphery.hpp:167-188) so collision/repulsion get REAL geometry
        # through the ellipsoid formulas instead of silently no-opping
        # (the reference's generic fiber_interaction/check_collision are
        # warn-stubs, periphery.cpp:265-317 — this is strictly better)
        if (shape == SHAPE_GENERIC and meridian is None
                and not any(self.abc) and state is not None
                and state.nodes.shape[0] > 0):
            nodes = np.asarray(state.nodes)
            self.abc = tuple(float(np.abs(nodes[:, i]).max())
                             for i in range(3))

    @property
    def interaction_shape(self) -> str:
        """Shape label for runtime collision/repulsion/binding dispatch:
        generic shells with derived extents route through the ellipsoid
        formulas (see __init__); the solve operators are untouched (they
        come from the precompute npz regardless of shape)."""
        if (self.shape == SHAPE_GENERIC and self.meridian is None
                and any(self.abc)):
            return "ellipsoid"
        return self.shape

    @staticmethod
    def from_precompute(periphery_table: dict, dtype=jnp.float64) -> "Shell":
        """Load the npz written by the precompute pipeline (reference keys)."""
        data = np.load(periphery_table["precompute_file"])
        state = ShellState(
            nodes=jnp.asarray(data["nodes"], dtype),
            normals=jnp.asarray(data["normals"], dtype),
            weights=jnp.asarray(data["quadrature_weights"], dtype),
            M_inv=jnp.asarray(data["M_inv"], dtype),
            A=jnp.asarray(data["stresslet_plus_complementary"], dtype),
            solution=jnp.zeros(3 * data["nodes"].shape[0], dtype),
        )
        shape = periphery_table.get("shape", SHAPE_GENERIC)
        radius = float(periphery_table.get("radius", 0.0))
        abc = (float(periphery_table.get("a", 0.0)),
               float(periphery_table.get("b", 0.0)),
               float(periphery_table.get("c", 0.0)))
        meridian = (revolution_meridian(periphery_table["envelope"])
                    if periphery_table.get("envelope") else None)
        return Shell(state, shape=shape, radius=radius, abc=abc,
                     meridian=meridian)


def newton_schulz_inverse(A: jax.Array, iters: int = 60,
                          precise_iters: int = 16) -> jax.Array:
    """Matmul-only dense inverse: X_{k+1} = X_k (2I − A X_k).

    Globally convergent from X₀ = Aᵀ/(‖A‖₁‖A‖∞) (Pan–Schreiber); column
    pre-scaling by the diagonal keeps the iteration count modest for the
    diagonal-dominated second-kind shell operator. Pure matmuls — MXU work —
    which sidesteps XLA's TPU LU panel-size limits at large N and is how the
    device-side precompute inverts the periphery operator.

    Precision phasing: the first iters − precise_iters steps run at the
    backend's fast matmul precision (bf16 passes on TPU ≈ 6× faster). NS is
    self-correcting — quadratic local convergence scrubs the plateau-phase
    rounding — so only the last ``precise_iters`` steps need full precision.
    (X₀ = I is NOT safe here: ρ(I − AD⁻¹) > 1 for these operators and the
    iteration diverges violently — measured, not hypothetical.)
    """
    n = A.shape[0]
    d = jnp.diagonal(A)
    d = jnp.where(jnp.abs(d) > 0, d, 1.0)
    B = A / d[None, :]          # A D⁻¹: near-identity for this operator class
    norm1 = jnp.max(jnp.sum(jnp.abs(B), axis=0))
    norminf = jnp.max(jnp.sum(jnp.abs(B), axis=1))
    X = B.T / (norm1 * norminf)
    eye2 = 2.0 * jnp.eye(n, dtype=A.dtype)

    def body(_, X):
        return X @ (eye2 - B @ X)

    fast = max(iters - precise_iters, 0)
    if fast:
        with jax.default_matmul_precision("default"):
            X = jax.lax.fori_loop(0, fast, body, X)
    X = jax.lax.fori_loop(0, iters - fast, body, X)
    return (X / d[:, None])     # D⁻¹ (A D⁻¹)⁻¹ = A⁻¹


def build_shell_operators(nodes: jax.Array, normals: jax.Array,
                          weights: jax.Array):
    """Assemble the second-kind operator A and its inverse ON DEVICE.

    Same construction as the offline precompute (precompute/main.py
    build_periphery_operator): A = T − E − diag(1/w) + nnᵀ with the unknown
    being the weight-premultiplied density. Device-side assembly moves only
    the O(N) geometry to the accelerator and builds the O(N²) operators with
    MXU matmuls + a matmul-only dense inverse there — essential when
    host↔device bandwidth is scarce.

    The operator is assembled and returned in COMPONENT-MAJOR block layout
    (3×3 grid of (N, N) blocks): every intermediate is a clean (N, N) array,
    which is what TPU memory tiling wants — the node-major interleave would
    drag (…, 3)-trailing intermediates that Mosaic pads 3 → 128.
    """
    N = nodes.shape[0]
    d = nodes[:, None, :] - nodes[None, :, :]
    r2 = jnp.sum(d * d, axis=-1)
    nonzero = r2 > 0.0
    rinv = jnp.where(nonzero, jax.lax.rsqrt(jnp.where(nonzero, r2, 1.0)), 0.0)
    dn = jnp.einsum("ijk,jk->ij", d, normals)
    coeff = (-3.0 / (4.0 * jnp.pi)) * dn * rinv**5   # (N, N)
    da = [d[:, :, a] for a in range(3)]

    inv_w = 1.0 / weights
    blocks = []
    for a in range(3):
        row = []
        for b in range(3):
            Cab = coeff * da[a] * da[b]              # (N, N)
            # singularity subtraction: column (b, j) gets −e_b(j)[a]/w_j with
            # e_b(j)[a] = Σ_i C_ab'(i,j)… assembled below from the same C
            row.append(Cab)
            del Cab
        blocks.append(row)

    # e_sub[k][i][a] = Σ_j (coeff d_a d_k w)_ij  (the w-scaled column sums of
    # the same component blocks) — reference periphery.py singularity vectors
    for k in range(3):
        for a in range(3):
            e_ka = jnp.sum(blocks[a][k] * weights[None, :], axis=1)  # (N,)
            blocks[a][k] = blocks[a][k] - jnp.diag(e_ka * inv_w)
    for a in range(3):
        blocks[a][a] = blocks[a][a] - jnp.diag(inv_w)
    # complementary nnᵀ completion, componentwise outer products
    for a in range(3):
        for b in range(3):
            blocks[a][b] = blocks[a][b] + jnp.outer(normals[:, a], normals[:, b])

    A = jnp.block(blocks)
    # XLA's TPU LU hits scoped-VMEM limits at 3N ≳ 10⁴; the matmul-only
    # Newton–Schulz inverse stays on the MXU at any size
    M_inv = newton_schulz_inverse(A)
    return A, M_inv


def build_shell_operators_with_esub(nodes, normals, weights):
    """(A, M_inv, e_sub): like build_shell_operators, additionally returning
    the (3, 3, N) singularity-subtraction vectors the matrix-free apply
    needs (the dense A is only a build-time transient in that mode)."""
    N = nodes.shape[0]
    d = nodes[:, None, :] - nodes[None, :, :]
    r2 = jnp.sum(d * d, axis=-1)
    nonzero = r2 > 0.0
    rinv = jnp.where(nonzero, jax.lax.rsqrt(jnp.where(nonzero, r2, 1.0)), 0.0)
    dn = jnp.einsum("ijk,jk->ij", d, normals)
    coeff = (-3.0 / (4.0 * jnp.pi)) * dn * rinv**5
    da = [d[:, :, a] for a in range(3)]
    inv_w = 1.0 / weights
    blocks = [[coeff * da[a] * da[b] for b in range(3)] for a in range(3)]
    e_sub = jnp.stack([
        jnp.stack([jnp.sum(blocks[a][k] * weights[None, :], axis=1)
                   for k in range(3)])
        for a in range(3)])                                  # (3, 3, N)
    for k in range(3):
        for a in range(3):
            blocks[a][k] = blocks[a][k] - jnp.diag(e_sub[a, k] * inv_w)
    for a in range(3):
        blocks[a][a] = blocks[a][a] - jnp.diag(inv_w)
    for a in range(3):
        for b in range(3):
            blocks[a][b] = blocks[a][b] + jnp.outer(normals[:, a],
                                                    normals[:, b])
    A = jnp.block(blocks)
    M_inv = newton_schulz_inverse(A)
    return A, M_inv, e_sub


def shell_from_geometry(periphery_table: dict, dtype=jnp.float32) -> "Shell":
    """Build a Shell entirely from the config geometry: surface + quadrature
    host-side (O(N) data), dense operators assembled and inverted on device.
    Used when periphery_table["build_on_device"] is set."""
    from skellysim_tpu.precompute import quadrature, shapes
    from skellysim_tpu.precompute.main import PERIPHERY_NODE_SCALE_FACTOR as SF

    shape = periphery_table.get("shape", "sphere")
    if shape == "sphere":
        surf = shapes.sphere(periphery_table["n_nodes"],
                             periphery_table["radius"] * SF)
        weights = quadrature.sphere_weights(surf.nodes,
                                            periphery_table["radius"] * SF)
    elif shape == "ellipsoid":
        a = periphery_table["a"] * SF
        b = periphery_table["b"] * SF
        c = periphery_table["c"] * SF
        surf = shapes.ellipsoid(periphery_table["n_nodes"], a, b, c)
        weights = quadrature.ellipsoid_weights(surf.nodes, a, b, c)
    elif shape == "surface_of_revolution":
        from skellysim_tpu.precompute.main import _envelope_height_fn

        env = periphery_table["envelope"]
        surf = shapes.surface_of_revolution(
            _envelope_height_fn(env), env["lower_bound"], env["upper_bound"],
            target_nodes=periphery_table.get("n_nodes",
                                             env.get("n_nodes_target", 6000)),
            scale_factor=SF)
        weights = surf.weights
    else:
        raise ValueError(f"device-side build not supported for {shape!r}")
    normals = -surf.normals  # shell normals point into the domain

    nodes_d = jnp.asarray(surf.nodes, dtype)
    normals_d = jnp.asarray(normals, dtype)
    weights_d = jnp.asarray(weights, dtype)
    if periphery_table.get("matrix_free"):
        A, M_inv, e_sub = jax.jit(build_shell_operators_with_esub)(
            nodes_d, normals_d, weights_d)
        # drop the GB-class stored operator; demote the precond to bf16
        state = ShellState(nodes=nodes_d, normals=normals_d,
                           weights=weights_d,
                           M_inv=M_inv.astype(jnp.bfloat16), A=None,
                           solution=jnp.zeros(3 * surf.nodes.shape[0], dtype),
                           blocked=True, e_sub=e_sub)
        del A, M_inv
    else:
        A, M_inv = jax.jit(build_shell_operators)(nodes_d, normals_d,
                                                  weights_d)
        state = ShellState(nodes=nodes_d, normals=normals_d,
                           weights=weights_d,
                           M_inv=M_inv, A=A,
                           solution=jnp.zeros(3 * surf.nodes.shape[0], dtype),
                           blocked=True)
    return Shell(state, shape=shape,
                 radius=float(periphery_table.get("radius", 0.0)),
                 abc=(float(periphery_table.get("a", 0.0)),
                      float(periphery_table.get("b", 0.0)),
                      float(periphery_table.get("c", 0.0))),
                 meridian=(revolution_meridian(periphery_table["envelope"])
                           if periphery_table.get("envelope") else None))


# ---- pure jit-safe operations ----

def _cm(x: jax.Array) -> jax.Array:
    """node-major (3N,) → component-major."""
    return x.reshape(-1, 3).T.reshape(-1)


def _nm(x: jax.Array) -> jax.Array:
    """component-major (3N,) → node-major."""
    return x.reshape(3, -1).T.reshape(-1)


def _apply(state: ShellState, M: jax.Array, x: jax.Array) -> jax.Array:
    # row-sharded operators may carry zero-padded rows (mesh row counts,
    # parallel.mesh.shard_shell_state) — slice the GEMV back to 3N
    n3 = 3 * state.n_nodes
    if state.blocked:
        y = M @ _cm(x)
        return _nm(y[:n3] if M.shape[0] != n3 else y)
    y = M @ x
    return y[:n3] if M.shape[0] != n3 else y


def second_kind_apply_free(state: ShellState, x: jax.Array) -> jax.Array:
    """A·x WITHOUT the stored operator: one dense pairwise stresslet apply
    (Pallas on accelerators, the XLA reference kernel on CPU) plus the O(N)
    corrections (singularity subtraction, −1/w diagonal, nnᵀ completion).
    Node-major in/out — the solution-vector layout."""
    N = state.n_nodes
    q = x.reshape(N, 3)
    S = state.normals[:, :, None] * q[:, None, :]
    if jax.default_backend() == "cpu":
        from skellysim_tpu.kernels.reference import stresslet_apply as ev
    else:
        from skellysim_tpu.kernels.pallas_tpu import (
            stresslet_apply_pallas as ev)
    # T's block coefficient is −3/4π: 2× the stresslet kernel's −3/8π at η=1
    y = 2.0 * ev(state.nodes, S, state.nodes, 1.0)
    inv_w = 1.0 / state.weights
    y = y - jnp.einsum("aki,ik->ia", state.e_sub * inv_w[None, None, :], q)
    y = y - inv_w[:, None] * q
    y = y + state.normals * jnp.sum(state.normals * q)
    return y.reshape(-1)


def matvec(state: ShellState, x: jax.Array, v_on_shell: jax.Array) -> jax.Array:
    """A x + v (the shell block-row of the global operator)."""
    if state.A is None:
        return second_kind_apply_free(state, x) + v_on_shell.reshape(-1)
    return _apply(state, state.A, x) + v_on_shell.reshape(-1)


def precondition(state: ShellState, x: jax.Array) -> jax.Array:
    if state.M_inv.dtype == jnp.bfloat16:
        xm = _cm(x) if state.blocked else x
        y = jax.lax.dot(state.M_inv, xm.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32).astype(x.dtype)
        n3 = 3 * state.n_nodes
        if state.M_inv.shape[0] != n3:   # mesh row padding — see _apply
            y = y[:n3]
        return _nm(y) if state.blocked else y
    return _apply(state, state.M_inv, x)


def update_rhs(v_on_shell: jax.Array) -> jax.Array:
    return -v_on_shell.reshape(-1)


def flow(state: ShellState, r_trg: jax.Array, density: jax.Array, eta,
         evaluator=None) -> jax.Array:
    """Velocity at targets from the shell's double-layer density.

    density is the (3N,) weight-premultiplied solution vector; the physical
    double-layer strength is S = 2η n⊗q (periphery.cpp:61-74).
    """
    q = density.reshape(-1, 3)
    S = 2.0 * eta * state.normals[:, :, None] * q[:, None, :]
    eval_fn = evaluator if evaluator is not None else stresslet_apply
    return eval_fn(state.nodes, S, r_trg, eta)


# ---- shape-specific geometry (host metadata + traced point data) ----

def sphere_collision(radius: float, points: jax.Array, threshold) -> jax.Array:
    """True if any point reaches R − threshold (periphery.cpp:126-133)."""
    r2 = jnp.sum(points * points, axis=-1)
    return jnp.any(r2 >= (radius - threshold) ** 2)


def ellipsoid_collision(abc, points: jax.Array, threshold) -> jax.Array:
    """Reference's scaled-angle heuristic (periphery.cpp:204-224)."""
    a, b, c = abc
    scaled = points / jnp.asarray([a, b, c], points.dtype)
    smag = jnp.linalg.norm(scaled, axis=-1)
    phi = jnp.arctan2(scaled[:, 1], scaled[:, 0] + 1e-12)
    theta = jnp.arccos(jnp.clip(scaled[:, 2] / (1e-12 + smag), -1.0, 1.0))
    st = jnp.sin(theta)
    r_cortex = jnp.stack([
        (a - threshold) * st * jnp.cos(phi),
        (b - threshold) * st * jnp.sin(phi),
        (c - threshold) * jnp.cos(theta),
    ], axis=-1)
    return jnp.any(jnp.sum(points * points, axis=-1) >= jnp.sum(r_cortex * r_cortex, axis=-1))


def sphere_fiber_repulsion(radius: float, x: jax.Array, skip_first: jax.Array,
                           f0, l0) -> jax.Array:
    """Exponential steric wall force on fiber nodes (periphery.cpp:140-162).

    x: (B, n, 3) fiber node positions; skip_first: (B,) bool (minus-clamped
    fibers don't feel the wall at their anchored node).
    """
    r = jnp.linalg.norm(x, axis=-1)                      # (B, n)
    safe_r = jnp.where(r > 0, r, 1.0)
    u_hat = x / safe_r[..., None]
    inside = r < radius
    # dr points from the wall to the node; |dr| = radius − r
    f = -f0 * u_hat * jnp.exp(-(radius - r) / l0)[..., None]
    f = jnp.where(inside[..., None], f, 0.0)
    node_idx = jnp.arange(x.shape[1])[None, :]
    mask = jnp.logical_or(node_idx > 0, ~skip_first[:, None])
    return jnp.where(mask[..., None], f, 0.0)


def revolution_meridian(envelope: dict, n_seg: int = 512) -> np.ndarray:
    """Tabulate the meridian polyline of a surface of revolution, (2, n_seg+1).

    Row 0 is x (the symmetry axis), row 1 is the envelope height h(x) ≥ 0.
    The polyline is the runtime stand-in for the arbitrary user height
    function: every wall query (collision, steric repulsion, binding
    proximity) becomes a point-to-polyline distance in the (x, ρ) meridian
    plane — static-shape, branch-free work the TPU vectorizes trivially.
    The reference's GenericPeriphery leaves all of these as warn-stubs
    (periphery.cpp:265-335); this implements the real geometry.
    """
    from skellysim_tpu.precompute.main import _envelope_height_fn

    h = _envelope_height_fn(envelope)
    lb, ub = float(envelope["lower_bound"]), float(envelope["upper_bound"])
    eps = (ub - lb) * 1e-7
    x = np.linspace(lb, ub, n_seg + 1)
    hx = np.maximum(np.asarray(h(np.clip(x, lb + eps, ub - eps)), np.float64),
                    0.0)
    # closed surface: force the meridian to meet the axis at both ends so
    # the polyline caps the ends (points beyond them read as outside)
    hx[0] = 0.0
    hx[-1] = 0.0
    return np.stack([x, hx])


def _meridian_closest(meridian: jax.Array, px: jax.Array, rho: jax.Array):
    """Closest point on the meridian polyline to 2-D points (px, ρ).

    meridian: (2, S+1); px/rho: (...,). Returns (cx, ch, d) — the closest
    polyline point and the distance. Dense over all S segments: at fiber
    counts (10⁵ points × 512 segments) this is ~10⁸ fused multiply-adds,
    microseconds of VPU time, once per step.
    """
    mx, mh = meridian[0], meridian[1]
    x0, h0 = mx[:-1], mh[:-1]
    dxs, dhs = mx[1:] - x0, mh[1:] - h0
    L2 = jnp.maximum(dxs * dxs + dhs * dhs, 1e-300)
    shape = px.shape
    p = px.reshape(-1, 1)
    r = rho.reshape(-1, 1)
    t = ((p - x0) * dxs + (r - h0) * dhs) / L2
    t = jnp.clip(t, 0.0, 1.0)
    cx = x0 + t * dxs
    ch = h0 + t * dhs
    d2 = (p - cx) ** 2 + (r - ch) ** 2
    j = jnp.argmin(d2, axis=1)
    pick = lambda a: jnp.take_along_axis(a, j[:, None], axis=1)[:, 0]
    return (pick(cx).reshape(shape), pick(ch).reshape(shape),
            jnp.sqrt(pick(d2)).reshape(shape))


def revolution_wall_gap(meridian: jax.Array, points: jax.Array):
    """Signed distance to the revolution wall: positive inside, negative
    outside (matching the sphere's gap = R − r convention). Also returns the
    closest wall point (..., 3) for repulsion directions."""
    px = points[..., 0]
    rho = jnp.sqrt(points[..., 1] ** 2 + points[..., 2] ** 2)
    cx, ch, d = _meridian_closest(meridian, px, rho)
    h_at = jnp.interp(px, meridian[0], meridian[1])
    inside = (px > meridian[0, 0]) & (px < meridian[0, -1]) & (rho < h_at)
    gap = jnp.where(inside, d, -d)
    safe_rho = jnp.where(rho > 0, rho, 1.0)
    ey = jnp.where(rho > 0, points[..., 1] / safe_rho, 0.0)
    ez = jnp.where(rho > 0, points[..., 2] / safe_rho, 1.0)
    closest = jnp.stack([cx, ch * ey, ch * ez], axis=-1)
    return gap, closest


def revolution_collision(meridian: jax.Array, points: jax.Array,
                         threshold) -> jax.Array:
    """True if any point comes within ``threshold`` of the revolution wall
    (or has already crossed it) — the generic-periphery point-cloud check
    the reference stubs out (periphery.cpp:306-320)."""
    gap, _ = revolution_wall_gap(meridian, points)
    return jnp.any(gap <= threshold)


def revolution_fiber_repulsion(meridian: jax.Array, x: jax.Array,
                               skip_first: jax.Array, f0, l0) -> jax.Array:
    """Exponential steric wall force for revolution shells.

    Same force law as the sphere/ellipsoid versions (periphery.cpp:140-162):
    f = f0 · (dr/|dr|) · e^{−gap/l0} on nodes inside the wall, where dr
    points from the closest wall point to the node (inward). x: (B, n, 3).
    """
    gap, closest = revolution_wall_gap(meridian, x)      # (B, n), (B, n, 3)
    dr = x - closest
    d = jnp.linalg.norm(dr, axis=-1)
    safe_d = jnp.where(d > 0, d, 1.0)
    f = f0 * dr / safe_d[..., None] * jnp.exp(-gap / l0)[..., None]
    f = jnp.where((gap > 0)[..., None] & (d > 0)[..., None], f, 0.0)
    node_idx = jnp.arange(x.shape[1])[None, :]
    mask = jnp.logical_or(node_idx > 0, ~skip_first[:, None])
    return jnp.where(mask[..., None], f, 0.0)


def ellipsoid_fiber_repulsion(abc, x: jax.Array, skip_first: jax.Array,
                              f0, l0) -> jax.Array:
    """Ellipsoidal version (periphery.cpp:232-263)."""
    a, b, c = abc
    scaled = x / jnp.asarray([a, b, c], x.dtype)
    smag = jnp.linalg.norm(scaled, axis=-1)
    r = jnp.linalg.norm(x, axis=-1)
    phi = jnp.arctan2(scaled[..., 1], scaled[..., 0] + 1e-12)
    theta = jnp.arccos(jnp.clip(scaled[..., 2] / (1e-12 + smag), -1.0, 1.0))
    st = jnp.sin(theta)
    r_cortex = jnp.stack([a * st * jnp.cos(phi), b * st * jnp.sin(phi),
                          c * jnp.cos(theta)], axis=-1)
    rc_mag = jnp.linalg.norm(r_cortex, axis=-1)
    inside = r < rc_mag
    dr = x - r_cortex
    d = jnp.linalg.norm(dr, axis=-1)
    safe_d = jnp.where(d > 0, d, 1.0)
    f = f0 * dr / safe_d[..., None] * jnp.exp(-(rc_mag - r) / l0)[..., None]
    f = jnp.where(inside[..., None], f, 0.0)
    node_idx = jnp.arange(x.shape[1])[None, :]
    mask = jnp.logical_or(node_idx > 0, ~skip_first[:, None])
    return jnp.where(mask[..., None], f, 0.0)
