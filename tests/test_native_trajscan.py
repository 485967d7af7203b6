"""Native msgpack frame scanner: parity with the pure-Python index."""

import os

import msgpack
import numpy as np
import pytest

from skellysim_tpu.io.native import scan_frames
from skellysim_tpu.io.trajectory import TrajectoryWriter, pack_frame, pack_fiber


@pytest.fixture
def traj(tmp_path):
    path = str(tmp_path / "t.out")
    w = TrajectoryWriter(path)
    rng = np.random.default_rng(0)
    times = [0.05 * i for i in range(7)]
    for t in times:
        fibers = [pack_fiber(8, 0.0125, 1.0, 1.0, 2.5e-3, 500.0, 0.0, 1.0,
                             (-1, -1), rng.normal(size=8), rng.normal(size=(8, 3)),
                             False)]
        w.write_frame(pack_frame(t, 1e-3, [["a", "b"]], fibers, [], [],
                                 rng.normal(size=12)))
    w.close()
    return path, times


def test_native_scanner_available():
    # g++ is in the image; the scanner must build
    from skellysim_tpu.io import native

    assert native._load() is not None


def test_native_matches_python_index(traj):
    path, times = traj
    result = scan_frames(path)
    assert result is not None
    offsets, scanned_times, header_bytes = result
    assert header_bytes > 0
    np.testing.assert_allclose(scanned_times, times, atol=0)
    # offsets must point at the exact frame starts: decode each and compare
    with open(path, "rb") as f:
        data = f.read()
    for off, t in zip(offsets, times):
        frame = msgpack.Unpacker(raw=False).feed(data[off:]) or None
        u = msgpack.Unpacker(raw=False)
        u.feed(data[int(off):])
        frame = u.unpack()
        assert frame["time"] == t


def test_reader_uses_native_index(traj, tmp_path):
    path, times = traj
    from skellysim_tpu.io.trajectory import TrajectoryReader

    r = TrajectoryReader(path)
    assert r.times == times
    r.load_frame(3)
    assert r.frame["time"] == times[3]
    assert r.header is not None and r.header["trajversion"] == 1


def test_scanner_headerless_stream(tmp_path):
    path = str(tmp_path / "nohdr.out")
    with open(path, "wb") as f:
        for i in range(3):
            f.write(msgpack.packb({"time": float(i), "dt": 0.1}))
    offsets, t, header_bytes = scan_frames(path)
    assert header_bytes == 0
    assert list(t) == [0.0, 1.0, 2.0]
