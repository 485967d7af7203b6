"""Trajectory export for visualization tools.

Counterpart of the reference's ParaView programmable sources and Blender
importer (src/skelly_sim/paraview_utils/, scripts/skelly_blend.py). Instead
of tool-resident reader scripts, trajectories convert to standard files:

  * ParaView: VTK XML PolyData (.vtp) per frame — fibers as polylines with
    tension/arclength point data, body/shell surfaces as point clouds with
    normals-free glyphable points — plus a .pvd collection carrying the time
    series. Nothing beyond numpy is needed to write these.
  * Blender: one .npz with stacked per-frame fiber node arrays and body
    poses, loadable from a Blender script via numpy.
"""

from __future__ import annotations

import os
import xml.sax.saxutils as sx
from typing import List

import numpy as np

from skellysim_tpu.io.trajectory import TrajectoryReader


def _vtp_polydata(points: np.ndarray, lines: List[List[int]],
                  point_data: dict) -> str:
    """Minimal ASCII VTK XML PolyData document."""
    n_pts = len(points)
    out = []
    out.append('<?xml version="1.0"?>')
    out.append('<VTKFile type="PolyData" version="0.1" byte_order="LittleEndian">')
    out.append("<PolyData>")
    n_lines = len(lines)
    out.append(f'<Piece NumberOfPoints="{n_pts}" NumberOfVerts="0" '
               f'NumberOfLines="{n_lines}" NumberOfStrips="0" NumberOfPolys="0">')
    out.append("<Points>")
    out.append('<DataArray type="Float64" NumberOfComponents="3" format="ascii">')
    out.append(" ".join(f"{v:.17g}" for v in points.reshape(-1)))
    out.append("</DataArray></Points>")
    if point_data:
        out.append("<PointData>")
        for name, arr in point_data.items():
            arr = np.asarray(arr)
            ncomp = 1 if arr.ndim == 1 else arr.shape[1]
            out.append(f'<DataArray type="Float64" Name="{sx.escape(name)}" '
                       f'NumberOfComponents="{ncomp}" format="ascii">')
            out.append(" ".join(f"{v:.17g}" for v in arr.reshape(-1)))
            out.append("</DataArray>")
        out.append("</PointData>")
    if lines:
        out.append("<Lines>")
        out.append('<DataArray type="Int64" Name="connectivity" format="ascii">')
        out.append(" ".join(str(i) for line in lines for i in line))
        out.append("</DataArray>")
        out.append('<DataArray type="Int64" Name="offsets" format="ascii">')
        offsets, o = [], 0
        for line in lines:
            o += len(line)
            offsets.append(o)
        out.append(" ".join(str(i) for i in offsets))
        out.append("</DataArray></Lines>")
    out.append("</Piece></PolyData></VTKFile>")
    return "\n".join(out)


def export_paraview(trajectory_path: str, out_dir: str,
                    prefix: str = "skelly") -> str:
    """Write per-frame .vtp files + a .pvd time-series collection.

    Returns the .pvd path (open this in ParaView).
    """
    os.makedirs(out_dir, exist_ok=True)
    traj = TrajectoryReader(trajectory_path)
    entries = []
    for i in range(len(traj)):
        frame = traj.load_frame(i)
        fibers = traj["fibers"]
        pts, lines, tension, arclength = [], [], [], []
        offset = 0
        for fib in fibers:
            x = np.asarray(fib["x_"])
            n = x.shape[0]
            pts.append(x)
            lines.append(list(range(offset, offset + n)))
            tension.append(np.asarray(fib["tension_"]))
            seg = np.linalg.norm(np.diff(x, axis=0), axis=1)
            arclength.append(np.concatenate([[0.0], np.cumsum(seg)]))
            offset += n
        points = np.concatenate(pts, axis=0) if pts else np.zeros((0, 3))
        pd = {}
        if pts:
            pd["tension"] = np.concatenate(tension)
            pd["arclength"] = np.concatenate(arclength)
        doc = _vtp_polydata(points, lines, pd)
        fname = f"{prefix}_fibers_{i:06d}.vtp"
        with open(os.path.join(out_dir, fname), "w") as f:
            f.write(doc)
        entries.append((frame["time"], fname))

        bodies = frame.get("bodies", [[], [], []])
        flat = list(bodies[0]) + list(bodies[2])
        if flat:
            centers = np.stack([np.asarray(b["position_"]).reshape(-1) for b in flat])
            doc_b = _vtp_polydata(centers, [], {})
            with open(os.path.join(out_dir, f"{prefix}_bodies_{i:06d}.vtp"), "w") as f:
                f.write(doc_b)

    pvd = os.path.join(out_dir, f"{prefix}.pvd")
    with open(pvd, "w") as f:
        f.write('<?xml version="1.0"?>\n'
                '<VTKFile type="Collection" version="0.1">\n<Collection>\n')
        for t, fname in entries:
            f.write(f'<DataSet timestep="{t:.17g}" file="{fname}"/>\n')
        f.write("</Collection>\n</VTKFile>\n")
    return pvd


def export_blender_npz(trajectory_path: str, out_path: str) -> str:
    """Pack the trajectory into one .npz for Blender import scripts.

    Arrays: times (F,), fiber_x_<i> (F, n_i, 3) per fiber, body_positions
    (F, B, 3), body_orientations (F, B, 4) (w, x, y, z).
    """
    traj = TrajectoryReader(trajectory_path)
    times, fiber_frames, body_pos, body_quat = [], [], [], []
    for i in range(len(traj)):
        frame = traj.load_frame(i)
        times.append(frame["time"])
        fiber_frames.append([np.asarray(f["x_"]) for f in traj["fibers"]])
        bodies = frame.get("bodies", [[], [], []])
        flat = list(bodies[0]) + list(bodies[2])
        body_pos.append([np.asarray(b["position_"]).reshape(-1) for b in flat])
        body_quat.append([np.asarray(b["orientation_"]) for b in flat])
    data = {"times": np.asarray(times)}
    if fiber_frames and fiber_frames[0]:
        n_fib = min(len(fr) for fr in fiber_frames)
        for k in range(n_fib):
            data[f"fiber_x_{k}"] = np.stack([fr[k] for fr in fiber_frames])
    if body_pos and body_pos[0]:
        data["body_positions"] = np.asarray(body_pos)
        data["body_orientations"] = np.asarray(body_quat)
    np.savez(out_path, **data)
    return out_path
