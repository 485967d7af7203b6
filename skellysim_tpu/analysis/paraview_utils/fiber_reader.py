"""ParaView programmable-source SCRIPT body: fibers as polylines.

Paste into a Programmable Source (output type: vtkPolyData) with
fiber_reader_request.py as the RequestInformation script, after adding this
directory to the ParaView Python path. Counterpart of the reference's
paraview_utils/fiber_reader.py, updated for the fiber_type wire layout.

Point data: "fiber_id" and "arc_index" so fibers can be colored/selected.
"""

import vtk  # noqa: F401  (provided by ParaView's Python)

from trajectory_utility import load_frame, timestep_for

outInfo = self.GetOutputInformation(0)  # noqa: F821  (`self` = the source)

if outInfo.Has(vtk.vtkStreamingDemandDrivenPipeline.UPDATE_TIME_STEP()):
    time = outInfo.Get(vtk.vtkStreamingDemandDrivenPipeline.UPDATE_TIME_STEP())
else:
    time = 0

frame = load_frame(self.fhs, self.fpos,  # noqa: F821
                   timestep_for(self.times, time))  # noqa: F821

pts = vtk.vtkPoints()
lines = vtk.vtkCellArray()
fiber_id = vtk.vtkIntArray()
fiber_id.SetName("fiber_id")
arc_index = vtk.vtkIntArray()
arc_index.SetName("arc_index")

offset = 0
for fi, fib in enumerate(frame["fibers"]):
    x = fib["x_"]          # (n_nodes, 3) ndarray (decoded by load_frame)
    n_nodes = x.shape[0]
    lines.InsertNextCell(n_nodes)
    for i in range(n_nodes):
        lines.InsertCellPoint(offset)
        pts.InsertPoint(offset, x[i].tolist())
        fiber_id.InsertNextValue(fi)
        arc_index.InsertNextValue(i)
        offset += 1

pd = self.GetPolyDataOutput()  # noqa: F821
pd.SetPoints(pts)
pd.SetLines(lines)
pd.GetPointData().AddArray(fiber_id)
pd.GetPointData().AddArray(arc_index)
