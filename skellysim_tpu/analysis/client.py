"""Client for the listener analysis server (reader.py Listener analogue).

Spawns the simulation binary in --listen mode and exchanges length-prefixed
msgpack requests/responses over its stdin/stdout, decoding Eigen payloads to
numpy. Request shape matches the reference's dataclasses (reader.py:64-124).
"""

from __future__ import annotations

import struct
import subprocess
import sys
from dataclasses import dataclass, field
from typing import List, Optional

import msgpack
import numpy as np

from skellysim_tpu.io import trajectory as tio


def _nd(obj):
    if isinstance(obj, np.ndarray):
        return tio.encode_eigen_matrix(obj)
    return obj


@dataclass
class StreamlinesRequest:
    dt_init: float = 0.1
    t_final: float = 1.0
    abs_err: float = 1e-10
    rel_err: float = 1e-6
    back_integrate: bool = True
    x0: np.ndarray = field(default_factory=lambda: np.zeros((0, 3)))


@dataclass
class VelocityFieldRequest:
    x: np.ndarray = field(default_factory=lambda: np.zeros((0, 3)))


@dataclass
class Request:
    frame_no: int = 0
    evaluator: str = "direct"
    streamlines: StreamlinesRequest = field(default_factory=StreamlinesRequest)
    vortexlines: StreamlinesRequest = field(default_factory=StreamlinesRequest)
    velocity_field: VelocityFieldRequest = field(default_factory=VelocityFieldRequest)

    def to_wire(self) -> dict:
        sl = lambda r: {
            "dt_init": r.dt_init, "t_final": r.t_final, "abs_err": r.abs_err,
            "rel_err": r.rel_err, "back_integrate": r.back_integrate,
            "x0": _nd(np.asarray(r.x0, float)),
        }
        return {
            "frame_no": self.frame_no,
            "evaluator": self.evaluator,
            "streamlines": sl(self.streamlines),
            "vortexlines": sl(self.vortexlines),
            "velocity_field": {"x": _nd(np.asarray(self.velocity_field.x, float))},
        }


class Listener:
    """Spawn and drive a listener-mode simulation process."""

    def __init__(self, config_file: str = "skelly_config.toml",
                 python: Optional[str] = None, extra_args: List[str] = ()):
        import os

        python = python or sys.executable
        # make the package importable from any working directory
        pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        env = dict(os.environ)
        env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
        self.proc = subprocess.Popen(
            [python, "-m", "skellysim_tpu.cli", f"--config-file={config_file}",
             "--listen", *extra_args],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, env=env,
        )

    def request(self, req: Request) -> Optional[dict]:
        payload = msgpack.packb(req.to_wire())
        self.proc.stdin.write(struct.pack("<Q", len(payload)))
        self.proc.stdin.write(payload)
        self.proc.stdin.flush()
        head = self.proc.stdout.read(8)
        (size,) = struct.unpack("<Q", head)
        if size == 0:
            return None
        res = msgpack.unpackb(self.proc.stdout.read(size), raw=False)
        return tio.decode_payload(res)

    def close(self):
        try:
            self.proc.stdin.write(struct.pack("<Q", 0))
            self.proc.stdin.flush()
            self.proc.wait(timeout=10)
        except Exception:
            self.proc.kill()


def save_velocity_field(listener: "Listener", x_grid: np.ndarray,
                        path: str = "skelly_sim.vf",
                        frames: Optional[List[int]] = None,
                        evaluator: str = "direct") -> int:
    """Query the listener's velocity field over frames and dump msgpack
    records {time, x_grid, v_grid} (eigen-encoded (N, 3)) to ``path`` —
    the file the ParaView field_reader programmable source renders.

    Returns the number of frames written.
    """
    x_grid = np.asarray(x_grid, float).reshape(-1, 3)
    n = 0
    with open(path, "wb") as f:
        frame_iter = frames if frames is not None else _count_up()
        for i in frame_iter:
            res = listener.request(Request(
                frame_no=i, evaluator=evaluator,
                velocity_field=VelocityFieldRequest(x=x_grid)))
            if res is None:
                break
            rec = {
                "time": res["time"],
                "x_grid": tio.encode_eigen_matrix(x_grid),
                "v_grid": tio.encode_eigen_matrix(
                    np.asarray(res["velocity_field"], float).reshape(-1, 3)),
            }
            f.write(msgpack.packb(rec))
            n += 1
            if frames is None and i + 1 >= res.get("n_frames", i + 1):
                break
    return n


def _count_up():
    i = 0
    while True:
        yield i
        i += 1
