#!/usr/bin/env python3
"""Drive the analysis listener over a finished trajectory.

The listener serves streamline / vortex-line / velocity-field requests on a
length-prefixed msgpack pipe, exactly like `skelly_sim --listen`
(src/core/listener.cpp:86-136; examples/listener_mode/listener_example.py).
Run gen_config.py + the simulation first:

    python gen_config.py
    python -m skellysim_tpu.cli --config-file skelly_config.toml --overwrite
    python listener_example.py
"""

import numpy as np

from skellysim_tpu.analysis.client import (Listener, Request,
                                           StreamlinesRequest,
                                           VelocityFieldRequest)

listener = Listener(config_file="skelly_config.toml")
try:
    # velocity field on a probe grid around the fiber
    # offset the grid off the fiber axis (probes on the centerline sit at
    # the 1/r singularity of the slender-body kernel)
    g = np.linspace(-1.0, 1.0, 5) + 0.13
    X, Y, Z = np.meshgrid(g, g, g + 0.5, indexing="ij")
    probes = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)
    # find the last frame (frame 0 predates the first solve: zero flow)
    n_frames = listener.request(Request(frame_no=0))["n_frames"]
    req = Request(frame_no=n_frames - 1,
                  velocity_field=VelocityFieldRequest(x=probes))
    res = listener.request(req)
    v = np.asarray(res["velocity_field"]).reshape(-1, 3)
    print(f"velocity field on {v.shape[0]} probes; "
          f"max |v| = {np.linalg.norm(v, axis=1).max():.3e}")

    # a streamline seeded beside the fiber
    sreq = StreamlinesRequest(x0=np.array([[0.3, 0.0, 0.5]]))
    sreq.t_final = 0.5
    res = listener.request(Request(frame_no=n_frames - 1, streamlines=sreq))
    line = np.asarray(res["streamlines"][0]["x"])
    print(f"streamline: {line.shape[0]} points, "
          f"end {np.round(line[-1], 3)}")
finally:
    listener.close()
