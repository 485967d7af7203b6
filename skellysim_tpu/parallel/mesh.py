"""Device mesh and sharding helpers.

The distribution model (SURVEY §2.3 mapping):
  * fiber blocks shard on the batch axis ("fib") — the analogue of the
    reference's round-robin fiber distribution over MPI ranks
    (fiber_container_finite_difference.cpp:95-127); per-fiber dense algebra
    stays local, reductions ride ICI
  * pairwise kernels: sources stay sharded, targets are gathered (XLA inserts
    the all_gather) — the analogue of the periphery's
    Scatterv-rows/Allgatherv-vector layout (periphery.cpp:21-47)
  * small DOF blocks (bodies) replicate
"""

from __future__ import annotations



import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FIBER_AXIS = "fib"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (FIBER_AXIS,))


def put_global(arr, sharding: NamedSharding):
    """Place a host array under a sharding, multi-host-safe.

    Single-process: plain device_put. Multi-process (pod slices): every
    process holds the same full host array (the config and precompute npz
    are replicated inputs, exactly like the reference's rank-0 npz load +
    Scatterv, periphery.cpp:408-442), so assemble the global jax.Array by
    handing each addressable shard its slice of the replicated host copy.
    """
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def fiber_batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(FIBER_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_block_leaves(block, mesh: Mesh):
    """Place every (B, ...) leaf of a FiberBlock with the batch axis sharded."""
    sh = fiber_batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: put_global(a, sh), block)


def shard_shell_state(shell_state, mesh: Mesh):
    """Row-shard the periphery's dense operators over the mesh axis.

    The TPU analogue of the reference's Scatterv row distribution
    (periphery.cpp:408-442): M⁻¹ and the stresslet+complementary operator
    shard on their row (output) axis; the solution vector and node data stay
    replicated, so the per-device matvec is a local GEMV — XLA inserts the
    all-gather of the result where consumers need it.
    """
    row_sh = NamedSharding(mesh, P(FIBER_AXIS, None))
    rep = replicated(mesh)
    n_mesh = int(np.prod(mesh.devices.shape))
    rows = int(shell_state.M_inv.shape[0])
    pad = (-rows) % n_mesh
    if pad:
        # uneven row counts: zero-pad the row (output) axis to the mesh
        # multiple so the operators still row-shard — the GEMV's padded
        # outputs are sliced off by the consumers (shell._apply /
        # precondition slice to 3·n_nodes). The reference handles the
        # remainder rows with Scatterv counts (periphery.cpp:408-442);
        # replicating instead (the round-3 fallback) silently cost
        # ~2 × rows²·4 B of HBM per device at big shells.
        import logging

        import jax.numpy as jnp

        logging.getLogger("skellysim_tpu").info(
            "shell rows %d padded to %d for the %d-device mesh",
            rows, rows + pad, n_mesh)

        def _pad_rows(M):
            return jnp.pad(M, ((0, pad), (0, 0)))
    else:
        def _pad_rows(M):
            return M
    return shell_state.replace(
        M_inv=put_global(_pad_rows(shell_state.M_inv), row_sh),
        # matrix-free shells (A is None) have no dense operator to shard;
        # their apply is a pairwise kernel that GSPMD partitions from the
        # input shardings
        A=(put_global(_pad_rows(shell_state.A), row_sh)
           if shell_state.A is not None else None),
        e_sub=(put_global(shell_state.e_sub, rep)
               if shell_state.e_sub is not None else None),
        nodes=put_global(shell_state.nodes, rep),
        normals=put_global(shell_state.normals, rep),
        weights=put_global(shell_state.weights, rep),
        solution=put_global(shell_state.solution, rep),
    )


def pad_batch_to(block, multiple: int):
    """Pad a FiberBlock's batch dim to a multiple (inactive rows are benign:
    padded fibers are unit-length straight fibers with zero force)."""
    import jax.numpy as jnp

    B = block.n_fibers
    pad = (-B) % multiple
    if pad == 0:
        return block, B

    def pad_leaf(a):
        if not hasattr(a, "shape") or a.ndim == 0 or a.shape[0] != B:
            return a
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths)

    padded = jax.tree_util.tree_map(pad_leaf, block)
    # make padded fibers physically sane (straight, unit params) so assembly
    # stays well-conditioned
    n = block.n_nodes
    t = jnp.linspace(0.0, 1.0, n)
    straight = jnp.stack([t * 0, t * 0, t], axis=-1)
    x = padded.x.at[B:].set(straight)
    padded = padded.replace(
        x=x,
        length=padded.length.at[B:].set(1.0),
        length_prev=padded.length_prev.at[B:].set(1.0),
        bending_rigidity=padded.bending_rigidity.at[B:].set(1e-3),
        radius=padded.radius.at[B:].set(0.0125),
        penalty_param=padded.penalty_param.at[B:].set(500.0),
        beta_tstep=padded.beta_tstep.at[B:].set(1.0),
        binding_body=padded.binding_body.at[B:].set(-1),
        binding_site=padded.binding_site.at[B:].set(-1),
    )
    return padded, B


def host_global(tree):
    """Fully-addressable host copies of a (possibly process-sharded) pytree.

    Single-process: identity (np.asarray happens at the use site).
    Multi-process: all-gather every non-addressable leaf so every process
    holds the full array — the analogue of the reference's MPI Gatherv
    before rank-0 trajectory writes (fiber_container.cpp periodic output).
    Collective: every process must call it in lockstep.
    """
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    def leaf(a):
        if isinstance(a, jax.Array) and not a.is_fully_addressable:
            return np.asarray(multihost_utils.process_allgather(a, tiled=True))
        return a

    return jax.tree_util.tree_map(leaf, tree)
