"""System wiring of the Verlet-skin plan reuse (params.ewald_plan_skin).

The spectral-Ewald tier's per-step pairlist/binning builds are a fixed
~0.3 s cost per oocyte step on a v5e. With a skin, `System` carries the
plans across steps and the jitted step rebuilds them only when the
on-device displacement monitor reports a point moved beyond the validity
bound (skin/2 near, h/2 far) — otherwise it refreshes the position stores
with gathers. Kernel-level exactness claims: tests/test_ewald_plan_reuse.py.
Reference analogue: FMM tree reuse with invalidation
(/root/reference/include/kernels.hpp:80-118).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from skellysim_tpu.config import Config, Fiber, Params, perturbed_fiber_positions
from skellysim_tpu.system.system import System


def _build(skin_frac, seed=5):
    rng = np.random.default_rng(seed)
    fibers = []
    for i in range(6):
        base = np.array([np.cos(i), np.sin(i), 0.1 * i])
        x = perturbed_fiber_positions(0.02, 1.0, base, [0.0, 0.0, 1.0], 16,
                                      rng=rng)
        fibers.append(Fiber(n_nodes=16, length=1.0, bending_rigidity=0.01,
                            radius=0.0125, x=x.ravel().tolist()))
    cfg = Config(params=Params(eta=1.0, dt_initial=5e-3, gmres_tol=1e-10,
                               pair_evaluator="ewald",
                               ewald_points_per_a=3.0,
                               ewald_hybrid=False),
                 fibers=fibers)
    table = cfg.to_dict()
    table["params"]["ewald_plan_skin"] = skin_frac
    return System(table)


@pytest.fixture(scope="module")
def slab_env():
    # the slab far-field path is the only one supporting far-plan reuse;
    # force it on for the CPU suite (module scope: System caches jitted
    # steps that read the env at trace time)
    import os

    old = os.environ.get("SKELLY_SLAB")
    os.environ["SKELLY_SLAB"] = "1"
    yield
    if old is None:
        os.environ.pop("SKELLY_SLAB", None)
    else:
        os.environ["SKELLY_SLAB"] = old


def test_reuse_trajectory_matches_perstep_rebuild(slab_env):
    """Five coupled implicit steps with plan reuse ON must track the
    skin=0 (rebuild-every-step) trajectory to the truncation-tail class,
    and must actually REUSE (fewer rebuilds than steps)."""
    s_reuse = _build(0.25)
    s_fresh = _build(0.0)
    assert s_reuse._plan_init_fn is not None
    assert s_fresh._plan_init_fn is None

    for _ in range(5):
        _, conv_r = s_reuse.step()
        _, conv_f = s_fresh.step()
        assert conv_r and conv_f

    x_r = np.concatenate([np.asarray(b.x).ravel()
                          for b in s_reuse.fibers.blocks])
    x_f = np.concatenate([np.asarray(b.x).ravel()
                          for b in s_fresh.fibers.blocks])
    scale = np.abs(x_f).max()
    # per-step evaluator deviation is the shared real-space truncation
    # tail (~1e-7 relative per apply); 5 implicit steps stay well under
    assert np.abs(x_r - x_f).max() < 1e-5 * scale

    assert s_reuse._plan_steps == 5
    # dt 5e-3 moves these fibers far less than skin/2 per step: the whole
    # run must ride the refresh path
    assert s_reuse._plan_rebuilds < s_reuse._plan_steps
    assert s_fresh._plan_steps == 0   # no carry in rebuild-every-step mode


def test_displacement_violation_triggers_rebuild(slab_env):
    """Moving every fiber beyond skin/2 between steps must flip the
    on-device monitor and rebuild the plans (counted), and the solve must
    still converge on the moved geometry."""
    s = _build(0.25, seed=11)
    s.step()
    rebuilds0 = s._plan_rebuilds
    stk, _ = s._ewald_objects()
    # past the near bound (skin/2) but inside the Ewald box margin
    shift = 0.6 * stk.skin
    d = np.array([0.0, 0.0, shift])
    s.fibers.blocks = [b.replace(x=b.x + jnp.asarray(d, b.x.dtype))
                       for b in s.fibers.blocks]
    _, conv = s.step()
    assert conv
    assert s._plan_rebuilds > rebuilds0


def test_dynamic_instability_invalidates_plans(slab_env, tmp_path,
                                               monkeypatch):
    """Nucleation moves a slot's position discontinuously: the on-device
    displacement monitor must force a plan rebuild (or the capacity-growth
    path must reset the carry) — never a silent refresh of stale plans."""
    monkeypatch.chdir(tmp_path)
    from skellysim_tpu.config import Body
    from skellysim_tpu.io import tomlio
    from skellysim_tpu.precompute.main import precompute_body

    config = Config()
    config.params.eta = 1.0
    config.params.dt_initial = 0.01
    config.params.dt_max = 0.01
    config.params.t_final = 0.05
    config.params.gmres_tol = 1e-8
    config.params.pair_evaluator = "ewald"
    config.params.ewald_hybrid = False
    config.params.seed = 42
    config.params.dynamic_instability.n_nodes = 8
    config.params.dynamic_instability.v_growth = 0.5
    config.params.dynamic_instability.f_catastrophe = 0.0
    config.params.dynamic_instability.nucleation_rate = 100.0
    config.params.dynamic_instability.min_length = 0.3
    config.params.dynamic_instability.bending_rigidity = 0.0025
    config.params.dynamic_instability.radius = 0.025

    radius = 0.5
    sites = []
    for k in range(4):
        phi = 2 * np.pi * k / 4
        sites += [radius * np.cos(phi), radius * np.sin(phi), 0.0]
    config.bodies = [Body(shape="sphere", radius=radius, n_nodes=300,
                          nucleation_sites=sites,
                          precompute_file="body_precompute.npz")]
    fib = Fiber(length=0.5, n_nodes=8, bending_rigidity=0.0025,
                parent_body=0, parent_site=0)
    fib.fill_node_positions(np.array([radius, 0.0, 0.0]),
                            np.array([1.0, 0.0, 0.0]))
    config.fibers = [fib]
    config.save("skelly_config.toml")
    cfg = tomlio.load("skelly_config.toml")
    precompute_body(cfg["bodies"][0])
    s = System(cfg)
    assert s._plan_init_fn is not None
    n0 = s.fibers.n_fibers
    for _ in range(4):
        err, conv = s.step()
        assert conv
        s.time += s.dt
    assert s.fibers.n_fibers > n0          # nucleation actually happened
    # the new fibers forced in-step rebuilds (displacement monitor) and/or
    # fresh seeds after capacity growth reset the carry; a silently-stale
    # full-refresh run would show 1 seed and 0 rebuilds
    assert s._plan_rebuilds + (s._plan_seeds - 1) >= 1, \
        (s._plan_rebuilds, s._plan_seeds)
