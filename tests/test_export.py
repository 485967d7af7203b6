"""Visualization export: VTK polydata well-formedness + Blender npz packing."""

import xml.etree.ElementTree as ET

import numpy as np
import pytest

from skellysim_tpu.analysis.export import export_blender_npz, export_paraview
from skellysim_tpu.io.trajectory import (
    TrajectoryWriter,
    pack_fiber,
    pack_frame,
    pack_spherical_body,
)


@pytest.fixture
def traj(tmp_path):
    path = str(tmp_path / "t.out")
    w = TrajectoryWriter(path)
    rng = np.random.default_rng(0)
    for i in range(3):
        fibers = [
            pack_fiber(8, 0.0125, 1.0, 1.0, 2.5e-3, 500.0, 0.0, 1.0, (-1, -1),
                       rng.normal(size=8), rng.normal(size=(8, 3)), False),
            pack_fiber(16, 0.0125, 1.0, 1.0, 2.5e-3, 500.0, 0.0, 1.0, (-1, -1),
                       rng.normal(size=16), rng.normal(size=(16, 3)), False),
        ]
        body = pack_spherical_body(0.5, np.array([0.0, 0.0, 0.1 * i]),
                                   [1.0, 0.0, 0.0, 0.0], np.zeros(6))
        w.write_frame(pack_frame(0.1 * i, 0.01, [["s", "s"]], fibers, [body], [],
                                 np.zeros(0)))
    w.close()
    return path


def test_export_paraview(traj, tmp_path):
    pvd = export_paraview(traj, str(tmp_path / "pv"))
    tree = ET.parse(pvd)
    datasets = tree.findall(".//DataSet")
    assert len(datasets) == 3
    times = [float(d.get("timestep")) for d in datasets]
    assert times == [0.0, 0.1, 0.2]
    # frame file parses and has the right point/line counts
    import os

    frame0 = ET.parse(os.path.join(tmp_path, "pv", datasets[0].get("file")))
    piece = frame0.find(".//Piece")
    assert int(piece.get("NumberOfPoints")) == 24
    assert int(piece.get("NumberOfLines")) == 2
    names = [a.get("Name") for a in frame0.findall(".//PointData/DataArray")]
    assert "tension" in names and "arclength" in names
    # bodies file exists
    assert os.path.exists(os.path.join(tmp_path, "pv", "skelly_bodies_000000.vtp"))


def test_export_blender_npz(traj, tmp_path):
    out = export_blender_npz(traj, str(tmp_path / "blend.npz"))
    data = np.load(out)
    assert data["times"].tolist() == [0.0, 0.1, 0.2]
    assert data["fiber_x_0"].shape == (3, 8, 3)
    assert data["fiber_x_1"].shape == (3, 16, 3)
    assert data["body_positions"].shape == (3, 1, 3)
    assert data["body_orientations"].shape == (3, 1, 4)
