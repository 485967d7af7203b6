"""ParaView programmable-source SCRIPT body: velocity-field point cloud.

Output type: vtkPolyData; RequestInformation: field_reader_request.py.
Reads skelly_sim.vf[.N] files — msgpack records {time, x_grid, v_grid}
with eigen-encoded (N, 3) matrices — as written by
``skellysim_tpu.analysis.client.save_velocity_field`` (the listener's
velocity_field responses dumped to disk; the reference's legacy field
writer used the same framing, so its field_reader renders these too).
"""

import numpy as np
import vtk  # noqa: F401

from trajectory_utility import decode_eigen, load_field_frame, timestep_for

outInfo = self.GetOutputInformation(0)  # noqa: F821

if outInfo.Has(vtk.vtkStreamingDemandDrivenPipeline.UPDATE_TIME_STEP()):
    time = outInfo.Get(vtk.vtkStreamingDemandDrivenPipeline.UPDATE_TIME_STEP())
else:
    time = 0

frame = load_field_frame(self.fhs, self.fpos,  # noqa: F821
                         timestep_for(self.times, time))  # noqa: F821

pts = vtk.vtkPoints()
velocities = vtk.vtkDoubleArray()
velocities.SetName("velocities")
velocities.SetNumberOfComponents(3)
magnitudes = vtk.vtkDoubleArray()
magnitudes.SetName("magnitudes")
magnitudes.SetNumberOfComponents(1)

offset = 0
for data in frame:
    x = np.atleast_2d(decode_eigen(data["x_grid"])).reshape(-1, 3)
    v = np.atleast_2d(decode_eigen(data["v_grid"])).reshape(-1, 3)
    for i in range(x.shape[0]):
        pts.InsertPoint(offset, x[i].tolist())
        velocities.InsertNextTuple(v[i].tolist())
        magnitudes.InsertNextValue(float(np.linalg.norm(v[i])))
        offset += 1

pd = self.GetPolyDataOutput()  # noqa: F821
pd.SetPoints(pts)
pd.GetPointData().AddArray(velocities)
pd.GetPointData().AddArray(magnitudes)
