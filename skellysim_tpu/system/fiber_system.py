"""Multi-resolution fiber ensemble: a list of same-node-count blocks.

The reference distributes heterogeneous fibers as a ragged rank-local
std::vector and loops per fiber
(src/core/fiber_container_finite_difference.cpp). Here fibers are grouped by
node count into dense batched blocks (the node counts come from the fixed
discretization set, matrices.SUPPORTED_NODE_COUNTS), so every container
operation is a short static Python loop over blocks of vmapped dense algebra.
Most configs use a single node count — one block, one fused kernel.

Global orderings:
  * node order      = blocks in ascending n_nodes, fibers in insertion order
  * solution order  = same, 4n entries per fiber ([x; y; z; T])
A host-side permutation maps config-file fiber order to (block, row) for I/O.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from skellysim_tpu.fibers import fd_fiber as ff
from skellysim_tpu.fibers.fd_fiber import FiberBlock, FiberBlockCache, FiberOperators
from skellysim_tpu.kernels.reference import stokeslet_apply


class FiberEnsemble:
    """Host-side wrapper: static structure (ops, permutation) + block pytrees."""

    def __init__(self, blocks: List[FiberBlock], ops: List[FiberOperators],
                 perm: List[Tuple[int, int]], emulated: bool = False):
        self.blocks = blocks
        self.ops = ops
        self.perm = perm  # config order -> (block index, row index)
        self.emulated = emulated
        self.ops_lo = ([ff.FiberOperatorsLo.for_node_count(b.n_nodes,
                                                           b.x.dtype)
                        for b in blocks] if emulated else None)

    @staticmethod
    def from_tables(fiber_tables: Sequence[dict], dtype=jnp.float64,
                    emulated: bool = False) -> "FiberEnsemble":
        """Group config fibers by node count into batched blocks."""
        by_n: dict = {}
        for i, t in enumerate(fiber_tables):
            x = np.asarray(t["x"], dtype=np.float64).reshape(-1, 3)
            n = x.shape[0]
            by_n.setdefault(n, []).append((i, t, x))
        blocks, ops, perm = [], [], [None] * len(fiber_tables)
        for bi, n in enumerate(sorted(by_n)):
            entries = by_n[n]
            get = lambda key, default: np.array([t.get(key, default) for _, t, _ in entries])
            block = ff.make_fiber_block(
                np.stack([x for _, _, x in entries]),
                lengths=jnp.asarray(get("length", 1.0), dtype),
                bending_rigidity=jnp.asarray(get("bending_rigidity", 2.5e-3), dtype),
                radius=jnp.asarray(get("radius", 0.0125), dtype),
                force_scale=jnp.asarray(get("force_scale", 0.0), dtype),
                binding_body=jnp.asarray(get("parent_body", -1), jnp.int32),
                binding_site=jnp.asarray(get("parent_site", -1), jnp.int32),
                minus_clamped=jnp.asarray(get("minus_clamped", False), bool),
                dtype=dtype,
                emulated=emulated,
            )
            blocks.append(block)
            ops.append(FiberOperators.for_node_count(n, dtype))
            for row, (i, _, _) in enumerate(entries):
                perm[i] = (bi, row)
        return FiberEnsemble(blocks, ops, perm, emulated=emulated)

    @property
    def n_fibers(self) -> int:
        return sum(b.n_fibers for b in self.blocks)

    @property
    def n_active(self) -> int:
        return int(sum(np.asarray(b.active).sum() for b in self.blocks))

    def active_rows(self):
        """[(block_idx, row)] for live fibers, in stable block/row order."""
        out = []
        for bi, b in enumerate(self.blocks):
            for row in np.flatnonzero(np.asarray(b.active)):
                out.append((bi, int(row)))
        return out

    def set_row(self, bi: int, row: int, **fields) -> None:
        """Write per-fiber fields into one slot (host-side mutation)."""
        b = self.blocks[bi]
        updates = {}
        for name, val in fields.items():
            arr = getattr(b, name)
            updates[name] = arr.at[row].set(val)
        self.blocks[bi] = b.replace(**updates)

    def free_slot(self, n_nodes: int, grow_chunk: int = 8):
        """(block_idx, row, grew) of a free slot for an n_nodes fiber,
        growing block capacity (and forcing recompilation) when full."""
        for bi, b in enumerate(self.blocks):
            if b.n_nodes != n_nodes:
                continue
            inactive = np.flatnonzero(~np.asarray(b.active))
            if len(inactive):
                return bi, int(inactive[0]), False
            # grow this block
            B = b.n_fibers

            def pad_leaf(a):
                if not hasattr(a, "shape") or a.ndim == 0 or a.shape[0] != B:
                    return a
                widths = [(0, grow_chunk)] + [(0, 0)] * (a.ndim - 1)
                return jnp.pad(a, widths)

            grown = jax.tree_util.tree_map(pad_leaf, b)
            # park new slots as benign unit fibers
            t = jnp.linspace(0.0, 1.0, n_nodes)
            straight = jnp.stack([t * 0, t * 0, t], axis=-1)
            grown = grown.replace(
                x=grown.x.at[B:].set(straight),
                length=grown.length.at[B:].set(1.0),
                length_prev=grown.length_prev.at[B:].set(1.0),
                bending_rigidity=grown.bending_rigidity.at[B:].set(1e-3),
                radius=grown.radius.at[B:].set(0.0125),
                penalty_param=grown.penalty_param.at[B:].set(500.0),
                beta_tstep=grown.beta_tstep.at[B:].set(1.0),
                binding_body=grown.binding_body.at[B:].set(-1),
                binding_site=grown.binding_site.at[B:].set(-1),
            )
            self.blocks[bi] = grown
            return bi, B, True
        # no block with this node count yet: create one
        t = np.linspace(0.0, 1.0, n_nodes)
        straight = np.stack([0 * t, 0 * t, t], axis=-1)
        block = ff.make_fiber_block(
            np.broadcast_to(straight, (grow_chunk, n_nodes, 3)).copy(),
            lengths=1.0, bending_rigidity=1e-3, active=False)
        self.blocks.append(block)
        self.ops.append(FiberOperators.for_node_count(n_nodes))
        return len(self.blocks) - 1, 0, True

    @property
    def node_count(self) -> int:
        return sum(b.n_fibers * b.n_nodes for b in self.blocks)

    @property
    def solution_size(self) -> int:
        return 4 * self.node_count

    def node_offsets(self) -> List[int]:
        offs, o = [], 0
        for b in self.blocks:
            offs.append(o)
            o += b.n_fibers * b.n_nodes
        return offs

    def solution_offsets(self) -> List[int]:
        offs, o = [], 0
        for b in self.blocks:
            offs.append(o)
            o += 4 * b.n_fibers * b.n_nodes
        return offs


# ---- pure functions over (blocks, ops) pytrees; jit-safe ----

def positions(blocks: List[FiberBlock]) -> jax.Array:
    """(N, 3) concatenated node positions in global node order."""
    if not blocks:
        return jnp.zeros((0, 3))
    return jnp.concatenate([b.x.reshape(-1, 3) for b in blocks], axis=0)


def split_nodes(blocks: List[FiberBlock], arr: jax.Array) -> List[jax.Array]:
    """Split a (N, ...) node-ordered array into per-block (B, n, ...) views."""
    out, o = [], 0
    for b in blocks:
        cnt = b.n_fibers * b.n_nodes
        out.append(arr[o:o + cnt].reshape(b.n_fibers, b.n_nodes, *arr.shape[1:]))
        o += cnt
    return out


def split_solution(blocks: List[FiberBlock], x: jax.Array) -> List[jax.Array]:
    out, o = [], 0
    for b in blocks:
        cnt = 4 * b.n_fibers * b.n_nodes
        out.append(x[o:o + cnt])
        o += cnt
    return out


def update_caches(blocks, ops, eta, dt, bc_minus, bc_plus, flows, f_externals,
                  v_on_fibers=None, f_on_fibers=None,
                  ops_lo=None, precond_bf16=False) -> List[FiberBlockCache]:
    caches = []
    for i, (b, op) in enumerate(zip(blocks, ops)):
        caches.append(ff.update_cache(
            b, op, eta, dt, bc_minus[i], bc_plus[i],
            flow=None if flows is None else flows[i],
            f_external=None if f_externals is None else f_externals[i],
            v_on_fiber=None if v_on_fibers is None else v_on_fibers[i],
            f_on_fiber=None if f_on_fibers is None else f_on_fibers[i],
            ops_lo=None if ops_lo is None else ops_lo[i],
            precond_bf16=precond_bf16,
        ))
    return caches


def apply_fiber_force(blocks, caches, x_fib: jax.Array) -> jax.Array:
    """(N, 3) force density from solution candidate (container apply_fiber_force)."""
    parts = []
    for b, c, xb in zip(blocks, caches, split_solution(blocks, x_fib)):
        parts.append(ff.apply_fiber_force(c, xb).reshape(-1, 3))
    return jnp.concatenate(parts, axis=0) if parts else jnp.zeros((0, 3))


def flow(blocks, ops, r_trg: jax.Array, forces: jax.Array, eta,
         subtract_self: bool = True, evaluator=None) -> jax.Array:
    """Velocity at r_trg from quadrature-weighted fiber node forces.

    Mirrors FiberContainerFiniteDifference::flow
    (fiber_container_finite_difference.cpp:172-214): weight by (L/2)·w_alpha,
    all-pairs stokeslet to targets, optionally subtract each fiber's
    self-interaction so only the cross-fiber hydrodynamics remains (the
    self-mobility is modeled by the SBT local drag instead).
    """
    if not blocks:
        return jnp.zeros_like(r_trg)
    f_split = split_nodes(blocks, forces)
    wf = [ff.weighted_forces(b, op, f) for b, op, f in zip(blocks, ops, f_split)]
    wf_all = jnp.concatenate([w.reshape(-1, 3) for w in wf], axis=0)
    r_src = positions(blocks)
    eval_fn = evaluator if evaluator is not None else stokeslet_apply
    u = eval_fn(r_src, wf_all, r_trg, eta)
    if subtract_self:
        self_parts = [ff.self_flow(b, w, eta).reshape(-1, 3)
                      for b, w in zip(blocks, wf)]
        u_self = jnp.concatenate(self_parts, axis=0)
        # self terms subtract only on the fiber-node targets, which occupy the
        # leading rows of r_trg by construction of the global node ordering
        u = u.at[:u_self.shape[0]].add(-u_self)
    return u


def matvec(blocks, ops, caches, x_fib: jax.Array, v_fib: jax.Array,
           v_boundary: Optional[List[jax.Array]] = None,
           include_A: bool = True, exact_A: bool = False) -> jax.Array:
    parts = []
    v_split = split_nodes(blocks, v_fib)
    for i, (b, op, c, xb) in enumerate(zip(blocks, ops, caches, split_solution(blocks, x_fib))):
        vb = None if v_boundary is None else v_boundary[i]
        parts.append(ff.matvec(b, op, c, xb, v_split[i], vb,
                               include_A=include_A, exact_A=exact_A))
    return jnp.concatenate(parts) if parts else jnp.zeros(0)


def precondition(blocks, caches, x_fib: jax.Array) -> jax.Array:
    parts = []
    for c, xb in zip(caches, split_solution(blocks, x_fib)):
        parts.append(ff.precondition(c, xb))
    return jnp.concatenate(parts) if parts else jnp.zeros(0)


def rhs(caches) -> jax.Array:
    parts = [c.RHS.reshape(-1) for c in caches]
    return jnp.concatenate(parts) if parts else jnp.zeros(0)  # empty sims only


def step(blocks, x_fib: jax.Array) -> List[FiberBlock]:
    return [ff.step(b, xb) for b, xb in zip(blocks, split_solution(blocks, x_fib))]


def pack_solution(blocks) -> jax.Array:
    """Solution-layout vector of the stored state — the emulated-precision
    residual expansion point (and GMRES warm-start origin)."""
    parts = [ff.pack_solution(b) for b in blocks]
    return jnp.concatenate(parts) if parts else jnp.zeros(0)


def step_delta(blocks, delta_fib: jax.Array) -> List[FiberBlock]:
    """Double-word state advance from solved increments (see ff.step_delta)."""
    return [ff.step_delta(b, d)
            for b, d in zip(blocks, split_solution(blocks, delta_fib))]


def residual_delta(blocks, ops, ops_lo, eta, dt, bc_minus, bc_plus,
                   flows=None, f_externals=None, v_on_fibers=None,
                   f_on_fibers=None) -> jax.Array:
    """Concatenated accurate fiber residual RHS − A·s_prev (see
    ff.residual_delta)."""
    parts = []
    for i, (b, op, ol) in enumerate(zip(blocks, ops, ops_lo)):
        parts.append(ff.residual_delta(
            b, op, ol, eta, dt, bc_minus[i], bc_plus[i],
            flow=None if flows is None else flows[i],
            f_external=None if f_externals is None else f_externals[i],
            v_on_fiber=None if v_on_fibers is None else v_on_fibers[i],
            f_on_fiber=None if f_on_fibers is None else f_on_fibers[i],
        ).reshape(-1))
    return jnp.concatenate(parts) if parts else jnp.zeros(0)


def fiber_error(blocks, ops) -> jax.Array:
    errs = [ff.fiber_error(b, op) for b, op in zip(blocks, ops)]
    return jnp.max(jnp.stack(errs)) if errs else jnp.zeros(())


def constant_motor_force(blocks, ops) -> List[jax.Array]:
    """Per-block (B, n, 3) tangential motor force f = force_scale · xs
    (fiber_container_finite_difference.cpp:160-169)."""
    out = []
    for b, op in zip(blocks, ops):
        xs, *_ = ff.derivatives(b, op)
        out.append(b.force_scale[:, None, None] * xs)
    return out
