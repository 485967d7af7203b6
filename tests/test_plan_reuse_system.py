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
