"""Distributed evaluation tests on the 8-device virtual CPU mesh.

Validates the shard_map partial-sum pairwise schedule against the single-chip
kernels, the sharded GMRES path, and the full sharded system step — the same
count/solution assertions the reference's MPI unit tests make
(unit_test_fibercontainer_finite_difference_mpi.cpp)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skellysim_tpu.kernels.reference import stokeslet_apply, stresslet_apply
from skellysim_tpu.parallel import mesh as pmesh
from skellysim_tpu.parallel.pairwise import sharded_stokeslet, sharded_stresslet

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def test_sharded_stokeslet_matches_single_device():
    mesh = pmesh.make_mesh(8)
    rng = np.random.default_rng(0)
    r_src = jnp.asarray(rng.uniform(-1, 1, (100, 3)))  # not divisible by 8
    f = jnp.asarray(rng.normal(size=(100, 3)))
    r_trg = jnp.asarray(rng.uniform(-1, 1, (37, 3)))
    fn = sharded_stokeslet(mesh)
    want = stokeslet_apply(r_src, f, r_trg, 0.7)
    got = fn(r_src, f, r_trg, 0.7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12, atol=1e-14)


def test_sharded_stresslet_matches_single_device():
    mesh = pmesh.make_mesh(8)
    rng = np.random.default_rng(1)
    r_src = jnp.asarray(rng.uniform(-1, 1, (64, 3)))
    S = jnp.asarray(rng.normal(size=(64, 3, 3)))
    r_trg = jnp.asarray(rng.uniform(-1, 1, (29, 3)))
    fn = sharded_stresslet(mesh)
    want = stresslet_apply(r_src, S, r_trg, 1.1)
    got = fn(r_src, S, r_trg, 1.1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12, atol=1e-14)


def test_sharded_system_step_matches_unsharded():
    # the full implicit step must produce identical physics when the fiber
    # batch is sharded across the mesh
    import __graft_entry__ as ge

    system = ge._tiny_system(n_fibers=8, n_nodes=8)
    blocks_ref = [b for b in system.fibers.blocks]
    out_ref = system._step_fn(blocks_ref, None, system.bodies.states(),
                              system.point_sources, system.background,
                              jnp.asarray(1e-3), jnp.asarray(0.0))
    x_ref = np.asarray(out_ref[0][0].x)

    mesh = pmesh.make_mesh(8)
    blocks_sh = [pmesh.shard_block_leaves(b, mesh) for b in system.fibers.blocks]
    out_sh = system._step_fn(blocks_sh, None, system.bodies.states(),
                             system.point_sources, system.background,
                             jnp.asarray(1e-3), jnp.asarray(0.0))
    x_sh = np.asarray(out_sh[0][0].x)
    np.testing.assert_allclose(x_sh, x_ref, rtol=1e-10, atol=1e-12)
    assert bool(out_sh[7]) == bool(out_ref[7])  # converged flag


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_shell_step_matches_unsharded(tmp_path, monkeypatch):
    # periphery operators row-sharded over the mesh: same physics as replicated
    monkeypatch.chdir(tmp_path)
    import numpy as np

    from skellysim_tpu.config import Config, Fiber, Periphery
    from skellysim_tpu.io import tomlio
    from skellysim_tpu.precompute.main import precompute_periphery
    from skellysim_tpu.system import System

    config = Config()
    config.params.dt_initial = 1e-4
    config.params.dt_min = 1e-5
    config.params.gmres_tol = 1e-10
    config.params.pair_evaluator = "direct"
    config.periphery = Periphery(n_nodes=400, shape="sphere", radius=4.0,
                                 precompute_file="peri.npz")
    fib = Fiber(force_scale=0.31, length=0.75, n_nodes=8, bending_rigidity=0.0025)
    fib.fill_node_positions(np.array([1.0, 0.0, 0.0]), np.array([0.0, 0.0, 1.0]))
    config.fibers = [fib]
    config.save("skelly_config.toml")
    cfg = tomlio.load("skelly_config.toml")
    precompute_periphery(cfg)
    system = System(cfg)

    args_tail = (system.bodies.states(), system.point_sources, system.background,
                 jnp.asarray(1e-4), jnp.asarray(0.0))
    out_ref = system._step_fn(system.fibers.blocks, system.shell.state, *args_tail)
    x_ref = np.asarray(out_ref[3])

    mesh = pmesh.make_mesh(8)
    shell_sharded = pmesh.shard_shell_state(system.shell.state, mesh)
    out_sh = system._step_fn(system.fibers.blocks, shell_sharded, *args_tail)
    x_sh = np.asarray(out_sh[3])
    np.testing.assert_allclose(x_sh, x_ref, rtol=1e-9, atol=1e-11)


def test_ring_schedule_matches_single_device():
    from skellysim_tpu.parallel.pairwise import ring_pairwise

    mesh = pmesh.make_mesh(8)
    rng = np.random.default_rng(5)
    n = 96  # divisible by 8 for both shards
    r_src = jnp.asarray(rng.uniform(-1, 1, (n, 3)))
    f = jnp.asarray(rng.normal(size=(n, 3)))
    r_trg = jnp.asarray(rng.uniform(-1, 1, (n, 3)))
    fn = ring_pairwise(mesh, "fib")
    want = stokeslet_apply(r_src, f, r_trg, 0.8)
    got = fn(r_src, f, r_trg, 0.8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12,
                               atol=1e-14)


def test_sharded_step_all_block_types(tmp_path, monkeypatch):
    """Fibers batch-sharded + periphery row-sharded + bodies replicated, in
    ONE step — the production layout with every solution block type present
    (the reference's fiber round-robin / periphery Scatterv / body rank-0
    triple, SURVEY §2.3). Must reproduce the unsharded step exactly."""
    monkeypatch.chdir(tmp_path)
    from skellysim_tpu.config import Body, Config, Fiber, Periphery
    from skellysim_tpu.io import tomlio
    from skellysim_tpu.precompute.main import precompute_body, precompute_periphery
    from skellysim_tpu.system import System

    config = Config()
    config.params.eta = 1.0
    config.params.dt_initial = 1e-3
    config.params.gmres_tol = 1e-10
    config.params.pair_evaluator = "direct"
    config.periphery = Periphery(n_nodes=400, shape="sphere", radius=6.0,
                                 precompute_file="peri.npz")
    config.bodies = [Body(
        shape="sphere", radius=0.5, n_nodes=200, position=[0.0, 0.0, -1.5],
        external_force=[0.0, 0.0, 0.1],
        nucleation_sites=[0.0, 0.0, 0.5],
        precompute_file="body_precompute.npz")]
    rng = np.random.default_rng(11)
    fibers = []
    for i in range(8):
        f = Fiber(force_scale=0.05, length=0.75, n_nodes=8,
                  bending_rigidity=0.0025)
        f.fill_node_positions(np.array([1.5 + 0.2 * i, 0.0, 0.0]),
                              np.array([0.0, 0.0, 1.0]))
        fibers.append(f)
    config.fibers = fibers
    config.save("skelly_config.toml")
    cfg = tomlio.load("skelly_config.toml")
    precompute_periphery(cfg)
    precompute_body(cfg["bodies"][0])
    system = System(cfg)

    tail = (system.bodies.states(), system.point_sources, system.background,
            jnp.asarray(1e-3), jnp.asarray(0.0))
    out_ref = system._step_fn(system.fibers.blocks, system.shell.state, *tail)
    sol_ref = np.asarray(out_ref[3])

    mesh = pmesh.make_mesh(8)
    blocks_sh = [pmesh.shard_block_leaves(b, mesh)
                 for b in system.fibers.blocks]
    shell_sh = pmesh.shard_shell_state(system.shell.state, mesh)
    out_sh = system._step_fn(blocks_sh, shell_sh, *tail)
    sol_sh = np.asarray(out_sh[3])
    np.testing.assert_allclose(sol_sh, sol_ref, rtol=1e-9, atol=1e-11)
    assert bool(out_sh[7])


def test_sharded_ewald_apply_matches_single_device():
    """Explicit multi-device Ewald: pairlist chunks sharded (near) +
    points-sharded/grid-psum (far) vs the single-device apply."""
    from skellysim_tpu.kernels.ewald import EwaldStokeslet, EwaldStresslet

    mesh = pmesh.make_mesh(8)
    rng = np.random.default_rng(3)
    N = 500
    pts = jnp.asarray(rng.uniform(0.0, 2.0, (N, 3)))
    f = jnp.asarray(rng.normal(size=(N, 3)))
    ew = EwaldStokeslet(lo=[0, 0, 0], hi=[2, 2, 2], a=0.15,
                        dtype=jnp.float64)
    want = np.asarray(ew.apply(pts, f, pts, 0.9))
    ew.mesh = mesh
    got = np.asarray(ew.apply(pts, f, pts, 0.9))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)

    S = jnp.asarray(rng.normal(size=(N, 3, 3)))
    es = EwaldStresslet(lo=[0, 0, 0], hi=[2, 2, 2], a=0.15,
                        dtype=jnp.float64)
    want = np.asarray(es.apply(pts, S, pts, 0.9))
    es.mesh = mesh
    got = np.asarray(es.apply(pts, S, pts, 0.9))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_near_field_pairlist_sharded_matches_single():
    """near_apply_plan_sharded: pair chunks shard over the mesh, one psum
    combines — must equal the single-device pairlist evaluation exactly
    (chunk partial sums are disjoint row ranges)."""
    from skellysim_tpu.kernels import ewald_near_cluster as enc

    mesh = pmesh.make_mesh(8)
    rng = np.random.default_rng(77)
    a = 0.22
    r_cut = 3.5 * a
    r_src = jnp.asarray(rng.uniform(0, 2.0, (900, 3)))
    r_trg = jnp.asarray(rng.uniform(0, 2.0, (700, 3)))
    lo = jnp.asarray([-2 * r_cut] * 3)
    import skellysim_tpu.kernels.ewald_near_cluster as mod
    old = mod._CHUNK
    mod._CHUNK = 256        # force many chunks so the shard axis is real
    try:
        plan = enc.make_plan(r_src, r_trg, lo, r_cut, 2048)
        assert int(plan.dropped) == 0
        assert plan.rows.shape[0] >= 8
        f = jnp.asarray(rng.normal(size=(900, 3)))
        want = np.asarray(enc.near_apply_plan(plan, f, a, use_pallas=False))
        got = np.asarray(enc.near_apply_plan_sharded(plan, f, a, mesh,
                                                     use_pallas=False))
        np.testing.assert_allclose(got, want, rtol=1e-12,
                                   atol=1e-13 * np.abs(want).max())
    finally:
        mod._CHUNK = old
