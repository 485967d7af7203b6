"""ParaView programmable-source SCRIPT body: rigid bodies as spheres.

Output type: vtkMultiBlockDataSet; RequestInformation:
fiber_reader_request.py (same time index). Counterpart of the reference's
paraview_utils/body_reader.py. Set ``toml_file`` in the script's namespace
(default "skelly_config.toml") — body radii live in the config, not the
trajectory (reference behavior).
"""

import vtk  # noqa: F401

try:
    import tomllib as _toml

    def _load_toml(path):
        with open(path, "rb") as f:
            return _toml.load(f)
except ImportError:  # ParaView pythons < 3.11 ship `toml`
    import toml as _toml

    def _load_toml(path):
        with open(path) as f:
            return _toml.load(f)

from trajectory_utility import load_frame, timestep_for

outInfo = self.GetOutputInformation(0)  # noqa: F821

if outInfo.Has(vtk.vtkStreamingDemandDrivenPipeline.UPDATE_TIME_STEP()):
    time = outInfo.Get(vtk.vtkStreamingDemandDrivenPipeline.UPDATE_TIME_STEP())
else:
    time = 0

frame = load_frame(self.fhs, self.fpos,  # noqa: F821
                   timestep_for(self.times, time))  # noqa: F821

toml_file = globals().get("toml_file", "skelly_config.toml")
skelly_config = _load_toml(toml_file)
# trajectory order is [spherical..., deformable..., ellipsoidal...]
# (BodyContainer serialization); reorder the config bodies to match
cfg_bodies = sorted(skelly_config.get("bodies", []),
                    key=lambda b: {"sphere": 0, "deformable": 1,
                                   "ellipsoid": 2}.get(b.get("shape",
                                                             "sphere"), 0))

mb = vtk.vtkMultiBlockDataSet()
for i, body in enumerate(frame["bodies"]):
    pos = body["position_"]          # 3-vector, eigen-decoded by load_frame
    center = [float(v) for v in list(pos.ravel() if hasattr(pos, "ravel")
                                     else pos)[-3:]]
    cfg = cfg_bodies[i] if i < len(cfg_bodies) else {}
    s = vtk.vtkSphereSource()
    s.SetRadius(cfg.get("radius") or max(cfg.get("a", 0.5), cfg.get("b", 0.0),
                                         cfg.get("c", 0.0)))
    s.SetCenter(center)
    s.SetThetaResolution(32)
    s.SetPhiResolution(32)
    s.Update()
    mb.SetBlock(i, s.GetOutput())

self.GetOutput().ShallowCopy(mb)  # noqa: F821
