"""Cross-implementation regression vs the reference's own golden data.

Reproduces /root/reference/tests/combined/regression_tests/
test_body_fdfiber_compression.py: a fiber clamped to a rigid sphere that is
pushed (linear external force +z) into a spherical periphery with
periphery binding active, integrated to t=5 with adaptive dt, then the
final fiber shape and body position are compared against the npz the
reference's binary produced (fdfiber_compression_finalpositions.npz).

Tolerances: the z-profile (the compression/buckling observable) matches the
reference's FMM-computed golden data to the ~3e-4 relative class
(VALIDATION.md round-2 study: body z 0.029%, fiber tip exact to 5 digits;
an n_shell 1000/2000 refinement shows the residual is below
quadrature-scheme sensitivity). The x/y components carry the
symmetry-BROKEN buckling direction, which is seeded by numerical noise and
not comparable across implementations — only their magnitude is gated.

Slow (~100 adaptive steps with a 2000-node shell, f64): run with
    pytest tests -k reference_golden
"""

import os

import numpy as np
import pytest

from skellysim_tpu.config import Body, ConfigSpherical, Fiber
from skellysim_tpu.io import tomlio
from skellysim_tpu.precompute.main import precompute_body, precompute_periphery
from skellysim_tpu.system import System

GOLDEN = ("/root/reference/tests/combined/regression_tests/"
          "fdfiber_compression_finalpositions.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN),
    reason="reference golden data not available on this machine")


@pytest.fixture(scope="module")
def compression_run(tmp_path_factory):
    path = tmp_path_factory.mktemp("compression")
    cwd = os.getcwd()
    os.chdir(path)
    try:
        config = ConfigSpherical()
        config.params.eta = 1.0
        config.params.dt_initial = 5e-2
        config.params.dt_min = 1e-4
        config.params.dt_max = 5e-2
        config.params.dt_write = 5e-2
        config.params.t_final = 5.0
        config.params.gmres_tol = 1e-8
        config.params.seed = 130319
        # f64 direct evaluator stands in for the reference's FMM (the FMM is
        # itself validated against the direct kernels to 5e-9,
        # tests/core/kernel_test.cpp:25-26)
        config.params.pair_evaluator = "direct"
        config.params.precision = "double"
        config.params.adaptive_timestep_flag = True
        config.params.periphery_binding.active = True
        config.params.periphery_binding.threshold = 0.1

        body_radius = 0.5
        body_origin = np.array([0.0, 0.0, 2.2])
        site = np.array([0.0, 0.0, body_radius])
        config.bodies = [Body(
            shape="sphere", radius=body_radius, n_nodes=400,
            position=body_origin.tolist(),
            nucleation_sites=site.tolist(),
            external_force_type="Linear",
            external_force=[0.0, 0.0, 1.0],
            precompute_file="body_precompute.npz",
        )]

        fib = Fiber(n_nodes=32, length=1.0, bending_rigidity=2.5e-3,
                    parent_body=0, parent_site=0)
        fib.x = np.linspace(body_origin + site,
                            body_origin + site + np.array([0, 0, 1.0]),
                            32).ravel().tolist()
        config.fibers = [fib]

        config.periphery.n_nodes = 2000
        config.periphery.radius = 4.0 / 1.04
        config.save("skelly_config.toml")

        cfg = tomlio.load("skelly_config.toml")
        precompute_periphery(cfg)
        precompute_body(cfg["bodies"][0])
        system = System(cfg)
        system.run()
        yield system
    finally:
        os.chdir(cwd)


def test_reference_golden_fiber_z_profile(compression_run):
    golden = np.load(GOLDEN)
    x = np.asarray(compression_run.fibers.blocks[0].x[0])  # (32, 3)
    rel_z = np.abs(1.0 - x[:, 2] / golden["zlast"])
    assert rel_z.max() < 1e-3, f"fiber z profile deviates {rel_z.max():.2e}"
    # tip z matched the golden to 5 digits in the round-2 study
    assert abs(1.0 - x[-1, 2] / golden["zlast"][-1]) < 2e-4


def test_reference_golden_body_position(compression_run):
    golden = np.load(GOLDEN)
    pos = np.asarray(compression_run.bodies.bodies[0].state.position)
    assert abs(1.0 - pos[2] / golden["bodylast"][2]) < 1e-3
    # lateral drift is the noise-seeded symmetry-broken component: gate the
    # magnitude only (golden: [0.014, -0.003])
    assert np.linalg.norm(pos[:2]) < 0.1


def test_reference_golden_buckled_magnitude(compression_run):
    """The fiber DID buckle (compressed length < straight) and the lateral
    deflection magnitude is in the golden data's class."""
    golden = np.load(GOLDEN)
    x = np.asarray(compression_run.fibers.blocks[0].x[0])
    span_g = golden["zlast"][-1] - golden["zlast"][0]
    span = x[-1, 2] - x[0, 2]
    assert abs(1.0 - span / span_g) < 2e-3
    lat = np.linalg.norm(x[:, :2], axis=1).max()
    lat_g = np.max(np.hypot(golden["xlast"], golden["ylast"]))
    assert lat < 5 * lat_g + 0.05  # same order; direction/shape not gated
