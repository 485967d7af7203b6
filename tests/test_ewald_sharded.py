"""Slab-decomposed distributed far field (kernels/ewald_sharded).

Parity strategy mirrors the reference's kernel tests (kernel_test.cpp:
every driver vs the single-rank reference): the 8-virtual-device slabbed
far field must reproduce the single-device slab path — same spread window,
same spectra, FFT reassociation only — and the spectra must PHYSICALLY
shard (per-device slice = 1/nd of the y axis)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skellysim_tpu.kernels import ewald as ew
from skellysim_tpu.kernels import ewald_sharded as ews
from skellysim_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(8)


def _grid_and_points(n=600, dtype=jnp.float64, y_multiple=8, seed=0):
    rng = np.random.default_rng(seed)
    L = 4.0
    grid = ew.build_grid(np.zeros(3), np.full(3, L), a=0.35,
                         dtype=dtype, y_multiple=y_multiple)
    r_src = jnp.asarray(rng.uniform(0, L, (n, 3)), dtype)
    r_trg = jnp.asarray(rng.uniform(0, L, (n // 2 + 13, 3)), dtype)
    return grid, r_src, r_trg


def test_slab_grid_ok_requires_y_multiple():
    grid, _, _ = _grid_and_points(64, y_multiple=1)
    grid8, _, _ = _grid_and_points(64, y_multiple=8)
    assert grid8.shape[1] % 8 == 0
    assert ews.slab_grid_ok(grid8, 8)
    if grid.shape[1] % 8:
        assert not ews.slab_grid_ok(grid, 8)


def test_far_stokeslet_slabbed_matches_single_device(mesh8, monkeypatch):
    monkeypatch.setenv("SKELLY_SLAB", "1")
    grid, r_src, r_trg = _grid_and_points(600)
    rng = np.random.default_rng(1)
    f = jnp.asarray(rng.normal(size=(600, 3)), jnp.float64)
    ref = ew.far_field_apply(grid, r_src, f, r_trg)
    out = ews.far_field_apply_slabbed(grid, r_src, f, r_trg, mesh8)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-11 * scale)


def test_far_stresslet_slabbed_matches_single_device(mesh8, monkeypatch):
    monkeypatch.setenv("SKELLY_SLAB", "1")
    grid, r_src, r_trg = _grid_and_points(400, seed=2)
    rng = np.random.default_rng(3)
    S = jnp.asarray(rng.normal(size=(400, 3, 3)), jnp.float64)
    ref = ew.far_stresslet_apply(grid, r_src, S, r_trg)
    D = jnp.stack([S[:, 0, 0],
                   0.5 * (S[:, 0, 1] + S[:, 1, 0]),
                   0.5 * (S[:, 0, 2] + S[:, 2, 0]),
                   S[:, 1, 1],
                   0.5 * (S[:, 1, 2] + S[:, 2, 1]),
                   S[:, 2, 2]], axis=1)
    out = ews.far_field_apply_slabbed(grid, r_src, D, r_trg, mesh8,
                                      convolve="stresslet")
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-11 * scale)


def test_spectra_physically_sharded(mesh8):
    """shard_spectra leaves each device holding 1/nd of the y axis — the
    per-device spectra-memory claim is shapes, not trust."""
    grid, _, _ = _grid_and_points(64, dtype=jnp.float32)
    gs = ews.shard_spectra(grid, mesh8)
    P0, P1, P2 = grid.shape
    P2h = P2 // 2 + 1
    shards = gs.khat.addressable_shards
    assert len(shards) == 8
    for s in shards:
        assert s.data.shape == (6, P0, P1 // 8, P2h)
    # and the sharded spectra drive the slabbed apply unchanged
    rng = np.random.default_rng(4)
    r = jnp.asarray(rng.uniform(0.5, 3.5, (96, 3)), jnp.float32)
    f = jnp.asarray(rng.normal(size=(96, 3)), jnp.float32)
    out = ews.far_field_apply_slabbed(gs, r, f, r, mesh8)
    import os
    os.environ["SKELLY_SLAB"] = "1"
    try:
        ref = ew.far_field_apply(grid, r, f, r)
    finally:
        del os.environ["SKELLY_SLAB"]
    scale = float(jnp.max(jnp.abs(ref))) + 1e-30
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-5 * scale)


def test_far_slab_dropped_counts(mesh8):
    grid, r_src, _ = _grid_and_points(600)
    # generous cap: nothing dropped
    assert int(ews.far_slab_dropped(grid, mesh8, r_src, 600)) == 0
    # cap 1: almost everything on the busiest device dropped
    assert int(ews.far_slab_dropped(grid, mesh8, r_src, 1)) > 0


def test_evaluator_apply_with_mesh_uses_slabbed_path(mesh8, monkeypatch):
    """EwaldStokeslet.apply with mesh set routes through the slabbed far
    field and matches the single-device evaluator."""
    monkeypatch.setenv("SKELLY_SLAB", "1")
    rng = np.random.default_rng(5)
    L = 4.0
    n = 500
    r = jnp.asarray(rng.uniform(0, L, (n, 3)), jnp.float64)
    f = jnp.asarray(rng.normal(size=(n, 3)), jnp.float64)
    kw = dict(lo=[0, 0, 0], hi=[L] * 3, a=0.35, dtype=jnp.float64,
              y_multiple=8)
    ev = ew.EwaldStokeslet(**kw)
    u_ref = ev.apply(r, f, r, eta=0.9)
    ev_m = ew.EwaldStokeslet(**kw)
    ev_m.mesh = mesh8
    assert ews.slab_grid_ok(ev_m.grid, 8)
    u = ev_m.apply(r, f, r, eta=0.9)
    scale = float(jnp.max(jnp.abs(u_ref)))
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                               rtol=0, atol=1e-10 * scale)


def test_far_plan_sharded_matches_planless(mesh8):
    """Per-step sharded far plans (selection + local bins) must reproduce
    the in-apply binning exactly — the mesh analogue of far-plan reuse."""
    grid, r_src, r_trg = _grid_and_points(500, seed=7)
    rng = np.random.default_rng(8)
    f = jnp.asarray(rng.normal(size=(500, 3)), jnp.float64)
    ref = ews.far_field_apply_slabbed(grid, r_src, f, r_trg, mesh8)
    plan = ews.make_far_plan_sharded(grid, mesh8, r_src, r_trg)
    assert int(jnp.max(plan["dropped"])) == 0
    out = ews.far_field_apply_slabbed(grid, r_src, f, r_trg, mesh8,
                                      plan=plan)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_system_mesh_ewald_uses_far_plans(mesh8):
    """System on a mesh with ewald: step parity vs single-device now runs
    through sharded far plans (has_far_plans on the mesh path)."""
    import tests.test_system_mesh as tsm
    from skellysim_tpu.system import System

    cfg = tsm._config(8, n_nodes=8, evaluator="ewald", gmres_tol=1e-6)
    # a fine enough splitting width that the grid's x extent slab-
    # decomposes across 8 devices (Lloc >= support//2 + 1)
    cfg["params"]["ewald_a"] = 0.12
    s1 = System(cfg)
    s1.step()
    sol1 = np.asarray(s1.curr_solution)
    s8 = System(cfg, n_devices=8)
    from skellysim_tpu.kernels.ewald_sharded import slab_grid_ok
    stk, _ = s8._ewald_objects()
    assert stk.mesh is not None and slab_grid_ok(stk.grid, 8)
    s8.step()
    sol8 = np.asarray(s8.curr_solution)
    dev = np.abs(sol8 - sol1).max() / (np.abs(sol1).max() + 1e-30)
    assert dev < 1e-8, dev
