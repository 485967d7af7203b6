"""Body↔periphery and body↔body collision matrix, per shape pair.

The reference dispatches sphere/ellipsoid/deformable bodies against
spherical/ellipsoidal/generic peripheries but only implements
sphere-in-sphere, warn-stubbing the rest
(body_spherical.cpp:283-331, periphery.hpp:74-188); here every pair is
real. One test per pair: a clearly-separated placement must NOT collide,
a wall/overlap placement MUST."""

import types

import numpy as np
import pytest
import jax.numpy as jnp

from skellysim_tpu.periphery.shell import Shell, revolution_meridian
from skellysim_tpu.system.system import System


@pytest.fixture(scope="module")
def bodies(tmp_path_factory):
    """One real sphere body and one real ellipsoid body (tiny precompute)."""
    import os

    from skellysim_tpu.body import container as bcont
    from skellysim_tpu.precompute.main import precompute_body

    d = tmp_path_factory.mktemp("bodies")
    cwd = os.getcwd()
    os.chdir(d)
    try:
        tabs = [
            {"shape": "sphere", "radius": 0.5, "n_nodes": 60,
             "position": [0.0, 0.0, 0.0], "orientation": [1, 0, 0, 0],
             "precompute_file": "b_sph.npz", "nucleation_sites": []},
            {"shape": "ellipsoid", "axis_length": [0.8, 0.5, 0.3],
             "n_nodes": 60, "position": [0.0, 0.0, 0.0],
             "orientation": [1, 0, 0, 0],
             "precompute_file": "b_ell.npz", "nucleation_sites": []},
        ]
        for t in tabs:
            precompute_body(t)
        cont = bcont.BodyContainer.from_tables(tabs, dtype=jnp.float64)
        return cont.bodies
    finally:
        os.chdir(cwd)


def _shell(shape, **kw):
    sh = object.__new__(Shell)
    sh.shape = shape
    sh.radius = kw.get("radius", 0.0)
    sh.abc = kw.get("abc", (0.0, 0.0, 0.0))
    sh.meridian = kw.get("meridian")
    return sh


def _sys_with(shell=None):
    stub = types.SimpleNamespace(shell=shell)
    stub._body_cloud = lambda body: System._body_cloud(stub, body)
    stub._cloud_inside_body = System._cloud_inside_body
    return stub


def _at(body, pos):
    body.state = body.state.replace(position=jnp.asarray(pos, jnp.float64))
    return body


def _rev_shell():
    env = {"height": "0.5 * T * ((1 + 2*x/length)**p1) * "
                     "((1 - 2*x/length)**p2) * length",
           "T": 0.72, "p1": 0.4, "p2": 0.2, "length": 7.5,
           "lower_bound": -3.75, "upper_bound": 3.75}
    return _shell("surface_of_revolution", meridian=revolution_meridian(env))


@pytest.mark.parametrize("ib", [0, 1], ids=["sphere_body", "ellipsoid_body"])
def test_body_vs_spherical_periphery(bodies, ib):
    sh = _shell("sphere", radius=4.0)
    s = _sys_with(sh)
    assert not System._body_vs_periphery(s, _at(bodies[ib], [0, 0, 0]), 0.0)
    assert System._body_vs_periphery(s, _at(bodies[ib], [0, 0, 4.0]), 0.0)


@pytest.mark.parametrize("ib", [0, 1], ids=["sphere_body", "ellipsoid_body"])
def test_body_vs_ellipsoidal_periphery(bodies, ib):
    sh = _shell("ellipsoid", abc=(4.0, 3.0, 2.0))
    s = _sys_with(sh)
    assert not System._body_vs_periphery(s, _at(bodies[ib], [0, 0, 0]), 0.0)
    assert System._body_vs_periphery(s, _at(bodies[ib], [0, 0, 2.1]), 0.0)


@pytest.mark.parametrize("ib", [0, 1], ids=["sphere_body", "ellipsoid_body"])
def test_body_vs_revolution_periphery(bodies, ib):
    s = _sys_with(_rev_shell())
    assert not System._body_vs_periphery(s, _at(bodies[ib], [0, 0, 0]), 0.0)
    # the envelope waist is ~2.7 in radius at x = 0 → park at the wall
    assert System._body_vs_periphery(s, _at(bodies[ib], [0, 0, 2.8]), 0.0)


def test_body_vs_body_pairs(bodies):
    s = _sys_with()
    sph, ell = bodies
    # sphere-sphere (exact center check, body_spherical.cpp:304-310)
    _at(sph, [0, 0, 0])
    other = _at(ell, [3.0, 0, 0])
    assert not System._body_vs_body(s, sph, other, 0.0)
    # sphere-ellipsoid overlap: ellipsoid long axis 0.8 + sphere 0.5
    assert System._body_vs_body(s, sph, _at(ell, [0.9, 0, 0]), 0.0)
    assert not System._body_vs_body(s, sph, _at(ell, [1.6, 0, 0]), 0.0)


def test_ellipsoid_orientation_matters(bodies):
    """The ellipsoid's cloud test must honor orientation: a 90° rotation
    about z swaps the long axis from x to y."""
    s = _sys_with()
    sph, ell = bodies
    _at(sph, [0, 0, 0])
    _at(ell, [1.1, 0, 0])
    q90 = jnp.asarray([np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)])
    ell.state = ell.state.replace(orientation=q90)
    try:
        # long axis now along y: gap along x is 1.1 − 0.5 − 0.5 > 0
        assert not System._body_vs_body(s, sph, ell, 0.0)
    finally:
        ell.state = ell.state.replace(
            orientation=jnp.asarray([1.0, 0.0, 0.0, 0.0]))
    # restored: long axis along x again → overlap at 1.1 < 0.5 + 0.8
    assert System._body_vs_body(s, sph, ell, 0.0)
