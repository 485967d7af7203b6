"""The ParaView programmable-source reader set over a real trajectory.

ParaView itself isn't installed; the scripts exec with a minimal vtk stub
and a fake `self`, which exercises every line except vtk's own rendering —
the same strategy the reference leaves untested entirely (its
paraview_utils ship without any test, and its load_frame predates its own
fiber_type wire tag; see analysis/paraview_utils/__init__.py).
"""

import struct
import sys
import types
from pathlib import Path

import numpy as np
import pytest

PV_DIR = str(Path(__file__).resolve().parent.parent
             / "skellysim_tpu" / "analysis" / "paraview_utils")


@pytest.fixture
def sim_dir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


class _OutInfo:
    def __init__(self, time=0.0):
        self._time = time
        self.set_calls = {}

    def Has(self, key):
        return True

    def Get(self, key):
        return self._time

    def Set(self, key, value, n):
        self.set_calls[key] = (value, n)


class _Points:
    def __init__(self):
        self.pts = {}

    def InsertPoint(self, i, xyz):
        self.pts[i] = tuple(float(v) for v in xyz)


class _CellArray:
    def __init__(self):
        self.cells = []

    def InsertNextCell(self, n):
        self.cells.append([])

    def InsertCellPoint(self, i):
        self.cells[-1].append(i)


class _Array:
    def __init__(self):
        self.name = None
        self.values = []

    def SetName(self, n):
        self.name = n

    def SetNumberOfComponents(self, n):
        pass

    def InsertNextValue(self, v):
        self.values.append(v)

    def InsertNextTuple(self, t):
        self.values.append(tuple(t))


class _PointData:
    def __init__(self):
        self.arrays = {}

    def AddArray(self, a):
        self.arrays[a.name] = a


class _PolyData:
    def __init__(self):
        self.points = None
        self.lines = None
        self.pd = _PointData()

    def SetPoints(self, p):
        self.points = p

    def SetLines(self, l):
        self.lines = l

    def GetPointData(self):
        return self.pd


class _SphereSource:
    def __init__(self):
        self.radius = None
        self.center = None

    def SetRadius(self, r):
        self.radius = r

    def SetCenter(self, c):
        self.center = tuple(c)

    def SetThetaResolution(self, n):
        pass

    SetPhiResolution = SetThetaResolution

    def Update(self):
        pass

    def GetOutput(self):
        return self


class _MultiBlock:
    def __init__(self):
        self.blocks = {}

    def SetBlock(self, i, b):
        self.blocks[i] = b


class _MBOutput:
    def __init__(self):
        self.copied = None

    def ShallowCopy(self, mb):
        self.copied = mb


class _Self:
    def __init__(self, time=0.0, multiblock=False):
        self.out_info = _OutInfo(time)
        self.poly = _PolyData()
        self.mb_out = _MBOutput()

    def GetOutputInformation(self, i):
        return self.out_info

    def GetPolyDataOutput(self):
        return self.poly

    def GetOutput(self):
        return self.mb_out


def _vtk_stub():
    vtk = types.ModuleType("vtk")
    pipeline = types.SimpleNamespace(
        UPDATE_TIME_STEP=staticmethod(lambda: "UPDATE_TIME_STEP"),
        TIME_RANGE=staticmethod(lambda: "TIME_RANGE"),
        TIME_STEPS=staticmethod(lambda: "TIME_STEPS"),
    )
    vtk.vtkStreamingDemandDrivenPipeline = pipeline
    vtk.vtkPoints = _Points
    vtk.vtkCellArray = _CellArray
    vtk.vtkIntArray = _Array
    vtk.vtkDoubleArray = _Array
    vtk.vtkSphereSource = _SphereSource
    vtk.vtkMultiBlockDataSet = _MultiBlock
    return vtk


@pytest.fixture
def pv_env(monkeypatch):
    monkeypatch.syspath_prepend(PV_DIR)
    monkeypatch.setitem(sys.modules, "vtk", _vtk_stub())
    # the scripts import trajectory_utility flat (ParaView-style)
    sys.modules.pop("trajectory_utility", None)
    yield
    sys.modules.pop("trajectory_utility", None)


def _exec_script(name, self_obj, extra=None):
    src = (Path(PV_DIR) / name).read_text()
    g = {"self": self_obj, "__name__": "__paraview__"}
    if extra:
        g.update(extra)
    exec(compile(src, name, "exec"), g)
    return g


def _run_sim():
    from skellysim_tpu.config import Body, Config, Fiber
    from skellysim_tpu.io import tomlio
    from skellysim_tpu.precompute.main import precompute_body
    from skellysim_tpu.system import System

    config = Config()
    config.params.eta = 1.0
    config.params.dt_initial = 1e-3
    config.params.dt_min = 1e-4
    config.params.dt_max = 1e-3
    config.params.dt_write = 1e-3
    config.params.t_final = 3e-3
    config.params.gmres_tol = 1e-10
    config.params.adaptive_timestep_flag = False
    config.params.pair_evaluator = "direct"
    fib = Fiber(force_scale=0.2, length=0.8, n_nodes=8,
                bending_rigidity=0.0025)
    fib.fill_node_positions(np.array([2.0, 0.0, 0.0]),
                            np.array([0.0, 0.0, 1.0]))
    config.fibers = [fib]
    config.bodies = [Body(position=[0.0, 0.0, 0.0], shape="sphere",
                          radius=0.5, n_nodes=100,
                          external_force=[0.0, 0.0, 0.1],
                          precompute_file="body_precompute.npz")]
    config.save("skelly_config.toml")
    cfg = tomlio.load("skelly_config.toml")
    precompute_body(cfg["bodies"][0])
    s = System(cfg)
    s.run()
    return s


def test_fiber_and_body_readers(sim_dir, pv_env):
    from skellysim_tpu.io.trajectory import TrajectoryReader

    _run_sim()

    # RequestInformation: indexes frames, publishes timesteps
    me = _Self()
    _exec_script("fiber_reader_request.py", me)
    traj = TrajectoryReader("skelly_sim.out")
    assert len(me.times) == len(traj)
    assert me.out_info.set_calls["TIME_STEPS"][1] == len(traj)

    # fiber reader at the LAST frame's time
    me.out_info._time = me.times[-1]
    _exec_script("fiber_reader.py", me)
    traj.load_frame(-1)
    x_ref = np.asarray(traj["fibers"][0]["x_"])
    pts = np.array([me.poly.points.pts[i] for i in range(len(me.poly.points.pts))])
    np.testing.assert_allclose(pts, x_ref, rtol=0, atol=0)
    assert me.poly.lines.cells == [list(range(8))]
    assert me.poly.pd.arrays["fiber_id"].values == [0] * 8
    assert me.poly.pd.arrays["arc_index"].values == list(range(8))

    # body reader: sphere at the body's trajectory position, config radius
    _exec_script("body_reader.py", me)
    body = me.mb_out.copied.blocks[0]
    assert body.radius == 0.5
    pos_ref = np.asarray(traj["bodies"][0][0]["position_"]).ravel()[-3:]
    np.testing.assert_allclose(np.asarray(body.center), pos_ref)


def test_field_reader_roundtrip(sim_dir, pv_env):
    from skellysim_tpu.analysis.client import (Listener, save_velocity_field)

    _run_sim()
    x_grid = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 2.0]])
    lst = Listener("skelly_config.toml", extra_args=["--platform", "cpu"])
    try:
        n = save_velocity_field(lst, x_grid, "skelly_sim.vf")
    finally:
        lst.close()
    assert n >= 2

    me = _Self()
    _exec_script("field_reader_request.py", me)
    assert len(me.times) == n
    me.out_info._time = me.times[0]
    _exec_script("field_reader.py", me)
    pts = np.array([me.poly.points.pts[i] for i in range(len(me.poly.points.pts))])
    np.testing.assert_allclose(pts, x_grid)
    v = np.asarray(me.poly.pd.arrays["velocities"].values)
    m = np.asarray(me.poly.pd.arrays["magnitudes"].values)
    assert v.shape == (3, 3)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), m)
    assert m.max() > 0  # the forced body stirs the fluid at the probes
