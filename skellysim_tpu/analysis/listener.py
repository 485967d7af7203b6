"""Listener mode: analysis server over stdin/stdout.

Protocol-compatible with the reference (src/core/listener.cpp:86-136 and the
Python client in reader.py): requests and responses are length-prefixed
(uint64 little-endian) msgpack maps. A request selects a trajectory frame,
an evaluator, and any of {streamlines, vortexlines, velocity_field}; the
response carries {time, i_frame, n_frames, streamlines, vortexlines,
velocity_field}. A zero-length message terminates the server.
"""

from __future__ import annotations

import struct
import sys
from typing import BinaryIO, Optional

import msgpack
import numpy as np

from skellysim_tpu.analysis import streamline as sl
from skellysim_tpu.io import trajectory as tio


def _encode_line(line: dict) -> dict:
    return {
        "x": tio.encode_eigen_matrix(line["x"]),
        "val": tio.encode_eigen_matrix(line["val"]),
        "time": tio.encode_eigen_matrix(np.asarray(line["time"])),
    }


def _decode_x0(req: Optional[dict]) -> np.ndarray:
    if not req:
        return np.zeros((0, 3))
    x0 = tio.decode_payload(req.get("x0", req.get("x")))
    if x0 is None:
        return np.zeros((0, 3))
    x0 = np.atleast_2d(np.asarray(x0, float))
    if x0.size == 0:
        return np.zeros((0, 3))
    return x0.reshape(-1, 3)


def serve(system, stdin: Optional[BinaryIO] = None, stdout: Optional[BinaryIO] = None):
    """Serve analysis requests until EOF or a zero-length terminate message."""
    stdin = stdin if stdin is not None else sys.stdin.buffer
    stdout = stdout if stdout is not None else sys.stdout.buffer
    reader = tio.TrajectoryReader(system._output_file)

    while True:
        head = stdin.read(8)
        if len(head) < 8:
            return
        (msgsize,) = struct.unpack("<Q", head)
        if msgsize == 0:
            return
        payload = stdin.read(msgsize)
        cmd = msgpack.unpackb(payload, raw=False)

        frame_no = cmd.get("frame_no", 0)
        if frame_no >= len(reader):
            stdout.write(struct.pack("<Q", 0))
            stdout.flush()
            continue
        frame = reader.load_frame(frame_no)
        system.load_frame_state(frame)
        # evaluator hot-swap (listener.cpp:117 / System::set_evaluator).
        # Invalidate any cached Ewald evaluators: their box and capacities
        # were sized for the geometry at construction — a swap after
        # loading a different frame's geometry would otherwise reuse stale
        # capacities and silently drop interactions.
        requested = cmd.get("evaluator")
        if requested and requested != system.params.pair_evaluator:
            system.params.pair_evaluator = requested
            system._ewald_pair = None
            if requested == "ewald":
                system._ewald_state = system._ewald_objects()[0].spectra()
            system._velocity_fn = system._build_velocity_fn()

        stream_req = cmd.get("streamlines", {})
        vortex_req = cmd.get("vortexlines", {})
        field_req = cmd.get("velocity_field", {})

        def _kw(req):
            return dict(
                dt_init=req.get("dt_init", 0.1), t_final=req.get("t_final", 1.0),
                abs_err=req.get("abs_err", 1e-10), rel_err=req.get("rel_err", 1e-6),
                back_integrate=req.get("back_integrate", True),
            )

        lines = [
            _encode_line(l)
            for l in sl.streamlines(system, _decode_x0(stream_req), **_kw(stream_req))
        ] if _decode_x0(stream_req).size else []
        vlines = [
            _encode_line(l)
            for l in sl.vortexlines(system, _decode_x0(vortex_req), **_kw(vortex_req))
        ] if _decode_x0(vortex_req).size else []

        x_field = _decode_x0(field_req)
        if x_field.size:
            vel = system.velocity_at_targets(x_field)
            vel_payload = tio.encode_eigen_matrix(vel)
        else:
            vel_payload = tio.encode_eigen_matrix(np.zeros((0, 3)))

        response = {
            "time": system.time,
            "i_frame": frame_no,
            "n_frames": len(reader),
            "streamlines": lines,
            "vortexlines": vlines,
            "velocity_field": vel_payload,
        }
        out = msgpack.packb(response)
        stdout.write(struct.pack("<Q", len(out)))
        stdout.write(out)
        stdout.flush()
