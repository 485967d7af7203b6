"""Drive analysis/blender_viz.build_scene headlessly with a bpy stub.

Blender isn't installed; a minimal bpy stand-in exercises every line of the
scene builder — curve creation, material setup, body keyframes, the shell,
and the frame-change handler that rewrites fiber control points — over an
npz produced by export_blender_npz from a real trajectory.
"""

import sys
import types

import numpy as np
import pytest


# ---- bpy stub ----

class _Input(dict):
    def __init__(self):
        super().__init__()

    def __getitem__(self, k):
        return self.setdefault(k, types.SimpleNamespace(default_value=None))

    def __contains__(self, k):
        return True


class _Material:
    def __init__(self, name):
        self.name = name
        self.use_nodes = False
        self.blend_method = None
        self.use_backface_culling = False
        bsdf = types.SimpleNamespace(inputs=_Input())
        self.node_tree = types.SimpleNamespace(
            nodes={"Principled BSDF": bsdf})
        # dict-like .get on nodes
        self.node_tree.nodes = types.SimpleNamespace(
            get=lambda k, d=None: bsdf if k == "Principled BSDF" else d)


class _Store:
    def __init__(self, factory):
        self._f = factory
        self.items = {}

    def get(self, name):
        return self.items.get(name)

    def new(self, name, *a, **kw):
        obj = self._f(name, *a, **kw)
        self.items[name] = obj
        return obj


class _Point:
    def __init__(self):
        self.co = (0.0, 0.0, 0.0, 1.0)


class _Points(list):
    def add(self, n):
        self.extend(_Point() for _ in range(n))

    def foreach_set(self, attr, flat):
        assert attr == "co"
        flat = list(flat)
        for i, p in enumerate(self):
            p.co = tuple(flat[4 * i:4 * i + 4])


class _Spline:
    def __init__(self, kind):
        self.kind = kind
        self.points = _Points()
        self.points.append(_Point())  # blender curves start with one point


class _Splines(list):
    def new(self, kind):
        s = _Spline(kind)
        self.append(s)
        return s


class _Curve:
    def __init__(self, name, type=None):
        self.name = name
        self.dimensions = None
        self.bevel_depth = None
        self.bevel_resolution = None
        self.splines = _Splines()
        self.materials = []
        self.updated = 0

    def update_tag(self):
        self.updated += 1


class _Object:
    def __init__(self, name, data):
        self.name = name
        self.data = data
        self.location = (0.0, 0.0, 0.0)
        self.scale = (1.0, 1.0, 1.0)
        self.keyframes = []

    def keyframe_insert(self, data_path, frame):
        self.keyframes.append((data_path, frame, tuple(self.location)))


class _Mesh:
    def __init__(self):
        self.materials = []


def _make_bpy():
    bpy = types.ModuleType("bpy")
    curves = _Store(lambda name, type=None: _Curve(name, type))
    materials = _Store(lambda name: _Material(name))
    objects = _Store(lambda name, data=None: _Object(name, data))
    linked = []

    scene = types.SimpleNamespace(frame_start=None, frame_end=None,
                                  frame_current=1)
    handlers = types.SimpleNamespace(frame_change_post=[])

    def frame_set(fr):
        scene.frame_current = fr
        for h in handlers.frame_change_post:
            h(scene)

    scene.frame_set = frame_set

    ctx = types.SimpleNamespace(
        collection=types.SimpleNamespace(
            objects=types.SimpleNamespace(link=linked.append)),
        scene=scene,
        active_object=None,
    )

    def sphere_add(segments=48, ring_count=24, radius=1.0, location=(0, 0, 0)):
        obj = _Object(f"sphere_{len(linked)}", _Mesh())
        obj.location = tuple(location)
        obj.radius = radius
        ctx.active_object = obj
        linked.append(obj)

    bpy.data = types.SimpleNamespace(curves=curves, materials=materials,
                                     objects=objects)
    bpy.context = ctx
    bpy.ops = types.SimpleNamespace(
        mesh=types.SimpleNamespace(primitive_uv_sphere_add=sphere_add),
        object=types.SimpleNamespace(shade_smooth=lambda: None),
    )
    bpy.app = types.SimpleNamespace(handlers=handlers)
    bpy._linked = linked
    return bpy


@pytest.fixture
def bpy_stub(monkeypatch):
    bpy = _make_bpy()
    monkeypatch.setitem(sys.modules, "bpy", bpy)
    sys.modules.pop("skellysim_tpu.analysis.blender_viz", None)
    yield bpy
    sys.modules.pop("skellysim_tpu.analysis.blender_viz", None)


def test_blender_scene_build(tmp_path, monkeypatch, bpy_stub):
    monkeypatch.chdir(tmp_path)
    from skellysim_tpu.config import Body, Config, Fiber
    from skellysim_tpu.io import tomlio
    from skellysim_tpu.precompute.main import precompute_body
    from skellysim_tpu.system import System
    from skellysim_tpu.analysis.export import export_blender_npz

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
    System(cfg).run()
    export_blender_npz("skelly_sim.out", "traj.npz")

    from skellysim_tpu.analysis import blender_viz

    # make obj.data.splines indexable the way blender's API is
    data = np.load("traj.npz")
    n_frames = blender_viz.build_scene("traj.npz", shell_radius=4.0,
                                       body_radius=0.5)
    assert n_frames == data["times"].shape[0] >= 3

    # fiber curve: one object, 8 control points at frame-0 positions
    fibers = [o for o in bpy_stub._linked if getattr(o, "name", "") == "fiber_0"]
    assert len(fibers) == 1
    pts0 = np.array([p.co[:3] for p in fibers[0].data.splines[0].points])
    np.testing.assert_allclose(pts0, data["fiber_x_0"][0], atol=1e-12)

    # body: keyframed at every frame, moving in +z
    bodies = [o for o in bpy_stub._linked if o.name == "body_0"]
    assert len(bodies) == 1
    assert len(bodies[0].keyframes) == n_frames
    z = [kf[2][2] for kf in bodies[0].keyframes]
    assert z[-1] > z[0]

    # shell present
    assert any(o.name == "shell" for o in bpy_stub._linked)

    # frame handler rewrites the fiber points to the requested frame
    bpy_stub.context.scene.frame_set(n_frames)
    pts_last = np.array([p.co[:3]
                         for p in fibers[0].data.splines[0].points])
    np.testing.assert_allclose(pts_last, data["fiber_x_0"][n_frames - 1],
                               atol=1e-6)
    assert not np.allclose(pts_last, pts0)
