"""Standalone trajectory parsing for the ParaView programmable sources.

Deliberately dependency-light (msgpack + numpy only — NO skellysim_tpu
import) so the file can sit next to a trajectory and be imported from
ParaView's Python. Mirrors the reference's
paraview_utils/trajectory_utility.py (get_frame_info / load_frame /
load_field_frame) with two fixes the reference's shipped copy lacks:

- the version-header record every trajectory starts with (write_header,
  reference system.cpp:191-218) is skipped instead of being counted as a
  frame (the reference's reader misaligns times/fpos by one record);
- the CURRENT fiber wire layout ``fibers = [fiber_type, [fiber, ...]]``
  (reference fiber_container_finite_difference.hpp:126) is unwrapped; the
  reference's copy still assumes the pre-fiber_type layout and fails on
  trajectories its own binary writes.
"""

import msgpack
import numpy as np


class DesyncError(Exception):
    pass


def decode_eigen(obj):
    """['__eigen__', cols, rows, *data] → (rows, cols) ndarray; other
    payloads pass through."""
    if isinstance(obj, (list, tuple)) and obj and obj[0] == "__eigen__":
        cols, rows = obj[1], obj[2]
        return np.asarray(obj[3:], np.float64).reshape(rows, cols)
    return obj


def _decode_tree(obj):
    if isinstance(obj, dict):
        return {k: _decode_tree(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        if obj and obj[0] == "__eigen__":
            return decode_eigen(obj)
        if obj and obj[0] == "__quat__":
            return np.asarray(obj[1:5], np.float64)
        return [_decode_tree(v) for v in obj]
    return obj


def get_frame_info(filenames):
    """Index one trajectory (possibly split across per-rank files).

    Returns (fhs, fpos, times): open file handles, per-file byte offsets of
    each FRAME record (header records skipped), and frame times read from
    file 0.
    """
    filenames = [str(f) for f in filenames]
    if not filenames:
        return [], [], []
    fhs = [open(f, "rb") for f in filenames]
    unpackers = [msgpack.Unpacker(f, raw=False) for f in fhs]
    fpos = [[] for _ in filenames]
    times = []
    while True:
        try:
            row_pos = [u.tell() for u in unpackers]
            time = None
            is_frame = False
            for i, u in enumerate(unpackers):
                if i == 0:
                    n_keys = u.read_map_header()
                    for _ in range(n_keys):
                        key = u.unpack()
                        if key == "time":
                            time = u.unpack()
                            is_frame = True
                        else:
                            u.skip()
                else:
                    u.skip()
            if is_frame:
                for i in range(len(fpos)):
                    fpos[i].append(row_pos[i])
                times.append(time)
        except msgpack.exceptions.OutOfData:
            break
    return fhs, fpos, times


def load_frame(fhs, fpos, index):
    """Load frame ``index`` merged across per-rank files, eigen-decoded.

    Returns a dict with at least time, dt, fibers (flat list of fiber
    dicts), bodies (flat list), and shell if present.
    """
    data = []
    for i in range(len(fhs)):
        fhs[i].seek(fpos[i][index])
        data.append(msgpack.Unpacker(fhs[i], raw=False).unpack())

    time = data[0]["time"]
    dt = data[0].get("dt")
    fibers = []
    fiber_type = 0
    for el in data:
        if el["time"] != time or el.get("dt") != dt:
            raise DesyncError
        f = el.get("fibers")
        if f:
            # current layout: [fiber_type, [fiber, ...]]; legacy: [[...]]
            if len(f) == 2 and isinstance(f[0], int):
                fiber_type = f[0]
                fibers.extend(f[1])
            else:
                fibers.extend(f[0])
        el.pop("fibers", None)

    frame = _decode_tree(data[0])
    frame["fibers"] = [_decode_tree(fib) for fib in fibers]
    frame["fiber_type"] = fiber_type
    bodies = frame.get("bodies")
    if bodies and isinstance(bodies, list) and isinstance(bodies[0], list):
        # wire layout: [spherical, deformable, ellipsoidal] sub-lists
        # (reference BodyContainer serialization) — flatten in order
        frame["bodies"] = [b for sub in bodies for b in sub]
    return frame


def load_field_frame(fhs, fpos, index):
    """Velocity-field record(s) at ``index`` (skelly_sim.vf.* files)."""
    data = []
    for i in range(len(fhs)):
        fhs[i].seek(fpos[i][index])
        data.append(msgpack.Unpacker(fhs[i], raw=False).unpack())
    return data


def timestep_for(times, time):
    """Map a ParaView UPDATE_TIME_STEP value to a frame index."""
    timestep = len(times) - 1
    for i in range(len(times) - 1):
        if times[i] <= time < times[i + 1]:
            timestep = i
            break
    return timestep
