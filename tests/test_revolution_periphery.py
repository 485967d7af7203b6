"""Runtime surface-of-revolution periphery interactions.

The reference's GenericPeriphery (used for revolution cortices) warn-stubs
check_collision and fiber_interaction (periphery.cpp:265-335); here they are
real, implemented as meridian-polyline distance queries. Validation strategy:
a revolution shell whose envelope is a SPHERE must reproduce the analytic
spherical wall geometry (collision, steric repulsion, binding), and the
oocyte-class envelope must confine fibers end-to-end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skellysim_tpu.periphery import shell as shell_ops

R = 1.3
SPHERE_ENV = {"height": "np.sqrt(np.maximum(R*R - x*x, 0.0))", "R": R,
              "lower_bound": -R, "upper_bound": R}
OOCYTE_ENV = {
    "height": "0.5 * T * ((1 + 2*x/length)**p1) * ((1 - 2*x/length)**p2) * length",
    "T": 0.72, "p1": 0.4, "p2": 0.2, "length": 7.5,
    "lower_bound": -3.75, "upper_bound": 3.75,
}


@pytest.fixture(scope="module")
def sphere_meridian():
    return jnp.asarray(shell_ops.revolution_meridian(SPHERE_ENV, n_seg=2048))


def test_meridian_tabulation_caps_ends():
    m = shell_ops.revolution_meridian(OOCYTE_ENV, n_seg=256)
    assert m.shape == (2, 257)
    assert m[1, 0] == 0.0 and m[1, -1] == 0.0
    assert (m[1, 1:-1] > 0).all()


def test_wall_gap_matches_sphere(sphere_meridian):
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.uniform(-1.6, 1.6, (400, 3)))
    gap, closest = shell_ops.revolution_wall_gap(sphere_meridian, pts)
    r = np.linalg.norm(np.asarray(pts), axis=-1)
    want = R - r                      # sphere signed gap
    # polyline resolution limits accuracy near the poles; 2048 segments
    # keep the worst-case chord error ~R·(π/2048)²/8
    np.testing.assert_allclose(np.asarray(gap), want, atol=2e-3)
    # closest points lie on the sphere
    cr = np.linalg.norm(np.asarray(closest), axis=-1)
    np.testing.assert_allclose(cr, R, atol=2e-3)


def test_collision_matches_sphere(sphere_meridian):
    inside = jnp.asarray([[0.3, 0.2, -0.1]])
    near = jnp.asarray([[0.0, R - 0.01, 0.0]])
    outside = jnp.asarray([[0.0, 0.0, R + 0.2]])
    assert not bool(shell_ops.revolution_collision(sphere_meridian, inside, 0.1))
    assert bool(shell_ops.revolution_collision(sphere_meridian, near, 0.1))
    assert bool(shell_ops.revolution_collision(sphere_meridian, outside, 0.0))
    # sphere reference agrees on all three
    for p, thr in ((inside, 0.1), (near, 0.1), (outside, 0.0)):
        assert bool(shell_ops.revolution_collision(sphere_meridian, p, thr)) \
            == bool(shell_ops.sphere_collision(R, p, thr))


def test_repulsion_matches_sphere(sphere_meridian):
    rng = np.random.default_rng(11)
    # nodes in the repulsion-active band near the equatorial wall (away from
    # the poles, where the polyline x-sampling is coarsest)
    theta = rng.uniform(np.pi / 3, 2 * np.pi / 3, (4, 8))
    phi = rng.uniform(0, 2 * np.pi, (4, 8))
    rad = rng.uniform(R - 0.15, R - 0.02, (4, 8))
    x = np.stack([rad * np.cos(theta),
                  rad * np.sin(theta) * np.cos(phi),
                  rad * np.sin(theta) * np.sin(phi)], axis=-1)
    x = jnp.asarray(x)
    skip = jnp.zeros(4, bool)
    f0, l0 = 20.0, 0.05
    want = shell_ops.sphere_fiber_repulsion(R, x, skip, f0, l0)
    got = shell_ops.revolution_fiber_repulsion(sphere_meridian, x, skip, f0, l0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-2, atol=1e-3 * float(jnp.abs(want).max()))
    # minus-clamped fibers don't feel the wall at node 0
    got_skip = shell_ops.revolution_fiber_repulsion(
        sphere_meridian, x, jnp.ones(4, bool), f0, l0)
    assert np.all(np.asarray(got_skip)[:, 0, :] == 0.0)
    assert np.allclose(np.asarray(got_skip)[:, 1:], np.asarray(got)[:, 1:])


def test_repulsion_zero_outside_and_deep_inside(sphere_meridian):
    x = jnp.asarray([[[0.0, 0.0, R + 0.3]], [[0.05, 0.0, 0.0]]])
    f = shell_ops.revolution_fiber_repulsion(sphere_meridian, x,
                                             jnp.zeros(2, bool), 20.0, 0.05)
    assert float(jnp.abs(f[0]).max()) == 0.0          # outside: no force
    assert float(jnp.abs(f[1]).max()) < 1e-8          # deep inside: ~e^{-25}


def _mini_revolution_system(**overrides):
    import tempfile, os
    from skellysim_tpu.config import Config, Fiber, Periphery
    from skellysim_tpu.system import System

    d = tempfile.mkdtemp()
    config = Config()
    config.params.eta = 1.0
    config.params.dt_initial = 5e-4
    config.params.dt_max = 5e-4
    config.params.t_final = 1.0
    config.params.gmres_tol = 1e-8
    config.params.pair_evaluator = "direct"
    config.params.periphery_interaction_flag = True
    for k, v in overrides.items():
        setattr(config.params, k, v)
    env = dict(OOCYTE_ENV, n_nodes_target=350)
    config.periphery = Periphery(shape="surface_of_revolution", n_nodes=350,
                                 envelope=env, precompute_file="unused.npz")
    fibers = []
    for xc in (-1.5, 0.0, 1.5):
        f = Fiber(force_scale=-1.0, length=0.6, n_nodes=8,
                  bending_rigidity=2.5e-3, minus_clamped=True)
        # radial fiber near the wall, pointing outward (force drives it out)
        h = 0.5 * 0.72 * (1 + 2 * xc / 7.5) ** 0.4 * (1 - 2 * xc / 7.5) ** 0.2 * 7.5
        base = np.array([xc, 0.0, h - 0.7])
        normal = np.array([0.0, 0.0, 1.0])
        f.fill_node_positions(base, normal)
        fibers.append(f)
    config.fibers = fibers
    cfg = config.to_dict()
    cfg["periphery"]["build_on_device"] = True
    return System(cfg, output_file=os.path.join(d, "traj.out"))


def test_oocyte_confinement_e2e():
    """Fibers pushed into a revolution wall stay confined: the wall force is
    in the solve (prep_state external force) and no node ends outside."""
    s = _mini_revolution_system()
    assert s.shell.meridian is not None
    mer = jnp.asarray(s.shell.meridian)
    for _ in range(8):
        err, conv = s.step()
        assert conv
    x = np.concatenate([np.asarray(b.x).reshape(-1, 3)
                        for b in s.fibers.blocks])
    gap, _ = shell_ops.revolution_wall_gap(mer, jnp.asarray(x))
    assert float(jnp.min(gap)) > 0.0, "fiber node escaped the revolution wall"


def test_revolution_collision_rejection():
    """check_collision() must fire when a fiber crosses the revolution wall
    (the adaptive-dt rejection trigger, system.cpp:576-595)."""
    s = _mini_revolution_system()
    assert not s.check_collision()
    # teleport one fiber's free end through the wall
    b = s.fibers.blocks[0]
    x = np.asarray(b.x).copy()
    x[0, -1] = [0.0, 0.0, 5.0]
    s.fibers.blocks[0] = b.replace(x=jnp.asarray(x))
    assert s.check_collision()


def test_revolution_binding_hinges_plus_end():
    """periphery_binding: a plus end within threshold of the revolution wall
    (and in the polar-angle band) must register as pinned."""
    s = _mini_revolution_system(
        periphery_binding={"active": True, "polar_angle_start": 0.0,
                           "polar_angle_end": np.pi, "threshold": 0.75})
    pinned = s._plus_pinned_mask(s.fibers.blocks[0])
    assert pinned.all()
    s2 = _mini_revolution_system(
        periphery_binding={"active": True, "polar_angle_start": 0.0,
                           "polar_angle_end": np.pi, "threshold": 0.01})
    assert not s2._plus_pinned_mask(s2.fibers.blocks[0]).any()


def test_body_vs_revolution_periphery_collision():
    """Sphere body near the revolution wall: exact center-gap check."""
    from skellysim_tpu.body.container import BodyContainer

    s = _mini_revolution_system()
    npz = _sphere_body_npz()
    body_table = {"shape": "sphere", "radius": 0.5, "position": [0.0, 0.0, 0.0],
                  "precompute_file": npz, "external_force": [0.0, 0.0, 0.0]}
    s.bodies = BodyContainer.from_tables([body_table], dtype=s.dtype)
    assert not s.check_collision()
    b = s.bodies.bodies[0]
    # envelope height at x=0 is ~2.5; center at z=2.2 puts the wall within R
    b.state = b.state.replace(position=jnp.asarray([0.0, 0.0, 2.2]))
    assert s.check_collision()


def _sphere_body_npz():
    import tempfile, os
    from skellysim_tpu.precompute.main import precompute_body

    d = tempfile.mkdtemp()
    path = os.path.join(d, "body.npz")
    precompute_body({"shape": "sphere", "radius": 0.5, "n_nodes": 100,
                     "precompute_file": path})
    return path


def test_body_body_collision_matrix():
    """Sphere-sphere exact + ellipsoid pairs via surface-cloud tests
    (reference warn-stubs all non-sphere pairs, body_spherical.cpp:311-331)."""
    from skellysim_tpu.body.container import BodyContainer
    import tempfile, os
    from skellysim_tpu.precompute.main import precompute_body

    d = tempfile.mkdtemp()
    sph = os.path.join(d, "s.npz")
    ell = os.path.join(d, "e.npz")
    precompute_body({"shape": "sphere", "radius": 0.5, "n_nodes": 100,
                     "precompute_file": sph})
    precompute_body({"shape": "ellipsoid", "axis_length": [1.6, 0.8, 0.8],
                     "n_nodes": 120, "precompute_file": ell})

    import __graft_entry__ as ge
    s = ge._tiny_system(n_fibers=1)

    def bodies(tables):
        return BodyContainer.from_tables(tables, dtype=s.dtype)

    base_s = {"shape": "sphere", "radius": 0.5, "precompute_file": sph,
              "external_force": [0.0, 0.0, 0.0]}
    base_e = {"shape": "ellipsoid", "axis_length": [1.6, 0.8, 0.8],
              "precompute_file": ell, "external_force": [0.0, 0.0, 0.0]}

    # sphere-sphere: exact center distance
    s.bodies = bodies([dict(base_s, position=[0.0, 0.0, 0.0]),
                       dict(base_s, position=[1.2, 0.0, 0.0])])
    assert not s.check_collision()
    s.bodies = bodies([dict(base_s, position=[0.0, 0.0, 0.0]),
                       dict(base_s, position=[0.9, 0.0, 0.0])])
    assert s.check_collision()

    # ellipsoid-sphere along the long axis (axis_length entries are
    # SEMI-axes, reference precompute.py:198-213: tip at x=1.6, quadrature
    # cloud at ~1.5)
    s.bodies = bodies([dict(base_e, position=[0.0, 0.0, 0.0]),
                       dict(base_s, position=[2.3, 0.0, 0.0])])
    assert not s.check_collision()
    s.bodies = bodies([dict(base_e, position=[0.0, 0.0, 0.0]),
                       dict(base_s, position=[1.8, 0.0, 0.0])])
    assert s.check_collision()

    # ellipsoid-ellipsoid: tip-to-tip
    s.bodies = bodies([dict(base_e, position=[0.0, 0.0, 0.0]),
                       dict(base_e, position=[3.5, 0.0, 0.0])])
    assert not s.check_collision()
    s.bodies = bodies([dict(base_e, position=[0.0, 0.0, 0.0]),
                       dict(base_e, position=[3.0, 0.0, 0.0])])
    assert s.check_collision()
