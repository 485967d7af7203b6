"""Trajectory I/O — msgpack stream, wire-compatible with the reference format.

Frame and header layouts follow the reference's trajectory version 1
(include/io_maps.hpp:17-55): a header map {trajversion, number_mpi_ranks,
fiber_type, skellysim_version, skellysim_commit, simdate, hostname} followed
by frame maps {time, dt, rng_state, fibers, bodies, shell}. Eigen payloads use
the ['__eigen__', cols, rows, <col-major data>] list encoding and quaternions
['__quat__', w, x, y, z] (include/eigen_matrix_plugin.h,
eigen_quaternion_plugin.h), so the reference's Python tooling (reader,
ParaView/Blender utilities) can consume trajectories produced here.

The trajectory doubles as the checkpoint: resume scans to the last frame and
restores state, like the reference's --resume path
(src/core/trajectory_reader.cpp:139-251). A ``.cindex`` sidecar caches frame
offsets/times keyed on file mtime (trajectory_reader.cpp:78-124).
"""

from __future__ import annotations

import os
import socket
import time as _time
from typing import Any, List, Optional

import msgpack
import numpy as np

TRAJECTORY_VERSION = 1
FIBER_TYPE_NONE = 0
FIBER_TYPE_FINITE_DIFFERENCE = 1


def encode_eigen_matrix(a: np.ndarray) -> list:
    """Encode as ['__eigen__', rows, cols, <col-major data>].

    1-d arrays encode as Eigen column vectors (n, 1). Node-major (n, 3) arrays
    encode as Eigen (3, n) matrices — their row-major ravel IS the Eigen
    col-major data, so no copy/transpose is needed.
    """
    a = np.asarray(a, dtype=np.float64)
    if a.ndim == 1:
        return ["__eigen__", a.shape[0], 1] + a.ravel().tolist()
    n, d = a.shape
    return ["__eigen__", d, n] + a.ravel().tolist()


def encode_quat(wxyz) -> list:
    w, x, y, z = (float(v) for v in wxyz)
    return ["__quat__", w, x, y, z]


def decode_payload(d: Any) -> Any:
    """Recursively convert __eigen__/__quat__ lists to numpy (reader.py:27-62)."""
    if isinstance(d, list):
        if d and d[0] == "__eigen__":
            rows, cols = d[1], d[2]
            if rows == 1 or cols == 1:
                return np.array(d[3:])
            if rows == 3:
                # positions: Eigen (3, n) col-major == node-major (n, 3)
                return np.array(d[3:]).reshape(cols, rows)
            return np.array(d[3:]).reshape(cols, rows).transpose()
        if d and d[0] == "__quat__":
            return np.array(d[1:])
        return [decode_payload(x) for x in d]
    if isinstance(d, dict):
        return {k: decode_payload(v) for k, v in d.items()}
    return d


class TrajectoryWriter:
    """Append-mode msgpack trajectory writer (rank-0 semantics of System::write)."""

    def __init__(self, path: str, fiber_type: int = FIBER_TYPE_FINITE_DIFFERENCE,
                 resume: bool = False, version_string: str = "skellysim_tpu"):
        self.path = path
        mode = "ab" if resume else "wb"
        self._f = open(path, mode)
        if not resume:
            header = {
                "trajversion": TRAJECTORY_VERSION,
                "number_mpi_ranks": 1,
                "fiber_type": fiber_type,
                "skellysim_version": version_string,
                "skellysim_commit": "tpu-native",
                "simdate": _time.ctime() + "\n",
                "hostname": socket.gethostname(),
            }
            self._f.write(msgpack.packb(header))
            self._f.flush()

    def write_frame(self, frame: dict) -> None:
        self._f.write(msgpack.packb(frame))
        self._f.flush()

    def close(self) -> None:
        self._f.close()


def pack_fiber(n_nodes: int, radius: float, length: float, length_prev: float,
               bending_rigidity: float, penalty_param: float, force_scale: float,
               beta_tstep: float, binding_site: tuple, tension: np.ndarray,
               x: np.ndarray, minus_clamped: bool) -> dict:
    """One fiber's frame entry (fiber_finite_difference.hpp:160-161 field set)."""
    return {
        "n_nodes_": int(n_nodes),
        "radius_": float(radius),
        "length_": float(length),
        "length_prev_": float(length_prev),
        "bending_rigidity_": float(bending_rigidity),
        "penalty_param_": float(penalty_param),
        "force_scale_": float(force_scale),
        "beta_tstep_": float(beta_tstep),
        "binding_site_": [int(binding_site[0]), int(binding_site[1])],
        "tension_": encode_eigen_matrix(np.asarray(tension)),
        "x_": encode_eigen_matrix(np.asarray(x)),
        "minus_clamped_": bool(minus_clamped),
    }


def pack_frame(time: float, dt: float, rng_state: List[List[str]],
               fibers: List[dict], spherical_bodies: List[dict],
               ellipsoidal_bodies: List[dict], shell_solution: np.ndarray) -> dict:
    return {
        "time": float(time),
        "dt": float(dt),
        "rng_state": rng_state,
        "fibers": [FIBER_TYPE_FINITE_DIFFERENCE, fibers],
        "bodies": [spherical_bodies, [], ellipsoidal_bodies],
        "shell": {"solution_vec_": encode_eigen_matrix(np.asarray(shell_solution))},
    }


def pack_spherical_body(radius: float, position: np.ndarray, orientation_wxyz,
                        solution: np.ndarray) -> dict:
    return {
        "radius_": float(radius),
        "position_": encode_eigen_matrix(np.asarray(position, dtype=np.float64)),
        "orientation_": encode_quat(orientation_wxyz),
        "solution_vec_": encode_eigen_matrix(np.asarray(solution)),
    }


def pack_ellipsoidal_body(radius: np.ndarray, position: np.ndarray, orientation_wxyz,
                          solution: np.ndarray) -> dict:
    return {
        "radius_": encode_eigen_matrix(np.asarray(radius, dtype=np.float64)),
        "position_": encode_eigen_matrix(np.asarray(position, dtype=np.float64)),
        "orientation_": encode_quat(orientation_wxyz),
        "solution_vec_": encode_eigen_matrix(np.asarray(solution)),
    }


class TrajectoryReader:
    """Random-access reader over the msgpack trajectory (reader.py analogue).

    Usage::

        traj = TrajectoryReader("skelly_sim.out")
        traj.load_frame(-1)
        x = traj["fibers"][0]["x_"]     # (n_nodes, 3)
    """

    def __init__(self, path: str = "skelly_sim.out"):
        # reference-API convenience: a config TOML selects the trajectory
        # next to it (reader.py constructs from the config file name)
        if path.endswith(".toml"):
            self.config_data = None
            try:
                from skellysim_tpu.io import tomlio

                self.config_data = tomlio.load(path)
            except OSError:
                pass
            path = os.path.join(os.path.dirname(path) or ".", "skelly_sim.out")
        else:
            self.config_data = None
        self.path = path
        self.header: Optional[dict] = None
        self.offsets: List[int] = []
        self.times: List[float] = []
        self.frame: Optional[dict] = None
        self._build_index()

    def _index_path(self) -> str:
        return self.path + ".cindex"

    def _build_index(self) -> None:
        mtime = os.stat(self.path).st_mtime
        # try the sidecar index first
        try:
            with open(self._index_path(), "rb") as f:
                idx = msgpack.unpackb(f.read(), strict_map_key=False)
            if idx.get("mtime") == mtime:
                self.offsets = idx["offsets"]
                self.times = idx["times"]
                with open(self.path, "rb") as f:
                    self.header = msgpack.Unpacker(f, raw=False).unpack()
                return
        except (OSError, ValueError, KeyError):
            pass

        scanned = False
        try:
            from skellysim_tpu.io.native import scan_frames

            result = scan_frames(self.path)
            if result is not None:
                offsets, times, header_bytes = result
                self.offsets = [int(o) for o in offsets]
                self.times = [float(t) for t in times]
                if header_bytes > 0:
                    with open(self.path, "rb") as f:
                        self.header = msgpack.Unpacker(f, raw=False).unpack()
                scanned = True
        except Exception:
            scanned = False

        if not scanned:
            with open(self.path, "rb") as f:
                unpacker = msgpack.Unpacker(f, raw=False)
                first = unpacker.unpack()
                if isinstance(first, dict) and "trajversion" in first:
                    self.header = first
                else:
                    # headerless stream: first object is already a frame
                    self.offsets.append(0)
                    self.times.append(first["time"])
                while True:
                    pos = unpacker.tell()
                    try:
                        obj = unpacker.unpack()
                    except msgpack.OutOfData:
                        break
                    self.offsets.append(pos)
                    self.times.append(obj["time"])
        try:
            with open(self._index_path(), "wb") as f:
                f.write(msgpack.packb({"mtime": mtime, "offsets": self.offsets,
                                       "times": self.times}))
        except OSError:
            pass

    def __len__(self) -> int:
        return len(self.offsets)

    def load_frame(self, i: int) -> dict:
        if i < 0:
            i += len(self.offsets)
        with open(self.path, "rb") as f:
            f.seek(self.offsets[i])
            raw = msgpack.Unpacker(f, raw=False).unpack()
        self.frame = decode_payload(raw)
        return self.frame

    def __getitem__(self, key: str):
        if self.frame is None:
            raise RuntimeError("call load_frame first")
        if key == "fibers":
            return self.frame["fibers"][1]
        return self.frame[key]
