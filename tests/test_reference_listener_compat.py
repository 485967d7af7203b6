"""Listener protocol compatibility against the REFERENCE's own client code.

Imports /root/reference/src/skelly_sim/reader.py (the reference's analysis
client: Request / StreamlinesRequest / VelocityFieldRequest dataclasses and
the Listener subprocess wrapper, reader.py:64-194), lets ITS code serialize
a request, pipes the wire bytes through our ``analysis.listener.serve``
subprocess, and decodes the response with ITS ``Listener.request`` logic —
proving the reference's analysis tooling works against this framework
unmodified.

The reference hardcodes an ``mpirun -n 1 …`` launch prefix
(reader.py:158); a shim ``mpirun`` on PATH strips the MPI flags and execs
the binary — the only environmental accommodation (no MPI in this image).
Its missing pip deps (toml, nptyping, dataclass_utils, function_generator)
are stubbed with no-op/shim modules; none affect the wire format.
"""

import importlib
import os
import stat
import sys
import types

import numpy as np
import pytest

REF_SRC = "/root/reference/src"
REF_READER = os.path.join(REF_SRC, "skelly_sim", "reader.py")

pytestmark = pytest.mark.skipif(not os.path.exists(REF_READER),
                                reason="reference checkout not present")


def _install_stub_modules():
    """Minimal shims for the reference's pip deps not baked into this image.
    Only names reader.py/skelly_config.py touch at import time."""
    import tomllib

    if "toml" not in sys.modules:
        m = types.ModuleType("toml")

        def _load(f):
            if hasattr(f, "read"):
                data = f.read()
                if isinstance(data, bytes):
                    data = data.decode()
                return tomllib.loads(data)
            with open(f, "rb") as fh:
                return tomllib.load(fh)

        m.load = _load
        m.dumps = lambda d: ""  # unused by the request path
        sys.modules["toml"] = m

    if "nptyping" not in sys.modules:
        m = types.ModuleType("nptyping")

        class NDArray:
            def __class_getitem__(cls, item):
                return np.ndarray

        class Shape:
            def __class_getitem__(cls, item):
                return item

        m.NDArray, m.Shape, m.Float64 = NDArray, Shape, np.float64
        sys.modules["nptyping"] = m

    if "dataclass_utils" not in sys.modules:
        m = types.ModuleType("dataclass_utils")
        m.check_type = lambda *a, **k: None
        sys.modules["dataclass_utils"] = m

    if "function_generator" not in sys.modules:
        m = types.ModuleType("function_generator")

        class FunctionGenerator:
            def __init__(self, *a, **k):
                pass

        m.FunctionGenerator = FunctionGenerator
        sys.modules["function_generator"] = m


def _import_reference_reader():
    _install_stub_modules()
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    return importlib.import_module("skelly_sim.reader")


def _write_shims(path, sim_dir):
    """mpirun shim (drops the reference's fixed 6 MPI args:
    '-n 1 -q -mca orte_abort_on_non_zero_status false') + a 'binary' that
    serves our listener from the sim directory."""
    mpirun = path / "mpirun"
    mpirun.write_text("#!/bin/sh\nshift 6\nexec \"$@\"\n")
    binary = path / "skelly_sim_tpu_listener"
    binary.write_text(
        "#!/bin/sh\n"
        f"cd {sim_dir}\n"
        f"export PYTHONPATH={os.path.dirname(os.path.dirname(os.path.abspath(__file__)))}\n"
        "exec python -m skellysim_tpu.cli --listen --platform cpu\n")
    for f in (mpirun, binary):
        f.chmod(f.stat().st_mode | stat.S_IEXEC)
    return str(binary)


def _run_small_sim():
    from skellysim_tpu.config import Config, Fiber
    from skellysim_tpu.io import tomlio
    from skellysim_tpu.system import System

    config = Config()
    config.params.eta = 1.0
    config.params.dt_initial = 1e-3
    config.params.dt_min = 1e-4
    config.params.dt_max = 1e-3
    config.params.dt_write = 1e-3
    config.params.t_final = 2e-3
    config.params.gmres_tol = 1e-10
    config.params.pair_evaluator = "direct"
    fib = Fiber(force_scale=0.31, length=0.75, n_nodes=8,
                bending_rigidity=0.0025)
    fib.fill_node_positions(np.array([0.0, 0.0, 0.0]),
                            np.array([0.0, 0.0, 1.0]))
    config.fibers = [fib]
    config.save("skelly_config.toml")
    system = System(tomlio.load("skelly_config.toml"))
    system.run()
    return system


def test_reference_client_drives_our_listener(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    system = _run_small_sim()
    ref_reader = _import_reference_reader()
    binary = _write_shims(tmp_path, tmp_path)
    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")

    # the reference's own Listener: spawns via its mpirun line, serializes
    # with msgpack.packb(asdict(req), default=_ndencode), length-prefixes
    # with np.uint64, decodes with object_hook=_eigen_to_numpy
    lst = ref_reader.Listener(toml_file="skelly_config.toml", binary=binary)
    try:
        req = ref_reader.Request()
        req.frame_no = 1
        req.evaluator = "CPU"
        req.velocity_field.x = np.array([[0.5, 0.5, 0.5], [1.0, 0.0, 0.0]])
        req.streamlines.x0 = np.array([[0.3, 0.3, 0.3]])
        req.streamlines.t_final = 0.05
        req.streamlines.dt_init = 0.01
        req.streamlines.back_integrate = False
        res = lst.request(req)

        assert res is not None
        assert res["i_frame"] == 1 and res["n_frames"] >= 2
        vf = np.asarray(res["velocity_field"])
        assert vf.shape == (2, 3) and np.all(np.isfinite(vf))
        # cross-check the decoded field against the direct in-process call
        system.load_frame_state(
            __import__("skellysim_tpu.io.trajectory",
                       fromlist=["TrajectoryReader"])
            .TrajectoryReader("skelly_sim.out").load_frame(1))
        u = system.velocity_at_targets(req.velocity_field.x)
        np.testing.assert_allclose(vf, u, rtol=1e-6, atol=1e-12)
        assert len(res["streamlines"]) == 1
        line = res["streamlines"][0]
        assert np.asarray(line["x"]).shape[1] == 3
        # out-of-range frame → zero-length response decoded as None by the
        # reference client (listener.cpp empty-response convention)
        req2 = ref_reader.Request()
        req2.frame_no = 10000
        assert lst.request(req2) is None
    finally:
        # reference __del__ sends the zero-length terminate message
        del lst
