"""Shared + per-process random streams.

Mirrors the reference's trng yarn2 split (src/core/rng.cpp:18-32): one
engine seeds a SHARED stream whose draws are identical on every process,
plus a DISTRIBUTED (process-unique) stream. The reference uses the
distributed stream for per-fiber catastrophe draws and the shared/rank-0
stream for nucleation events it then broadcasts
(src/core/dynamic_instability.cpp:98-162); with a shared stream every
process simply draws the same nucleation sequence — determinism by
replication instead of communication.

States serialize as the trajectory's rng_state entry, a list of
[shared, distributed] string pairs (include/io_maps.hpp:31-39; the
reference stores one pair per rank — we store the local process's pair).
Like the reference, resuming assumes an unchanged process count
(src/core/trajectory_reader.cpp:204-219): the distributed stream is
seeded per process index.
"""

from __future__ import annotations

import json
from typing import List

import numpy as np


_STATE_BYTES = 1024


def _encode_str(s: str, size: int = _STATE_BYTES) -> np.ndarray:
    """Fixed-size uint8 encoding (8-byte length prefix) so serialized RNG
    states can ride a process_allgather."""
    b = s.encode()
    if len(b) > size - 8:
        raise ValueError(f"RNG state string too long ({len(b)} bytes)")
    out = np.zeros(size, np.uint8)
    out[:8] = np.frombuffer(np.uint64(len(b)).tobytes(), np.uint8)
    out[8:8 + len(b)] = np.frombuffer(b, np.uint8)
    return out


def _decode_str(v: np.ndarray) -> str:
    n = int(np.frombuffer(np.ascontiguousarray(v[:8]).tobytes(),
                          np.uint64)[0])
    return np.ascontiguousarray(v[8:8 + n]).tobytes().decode()


class RNG:
    def __init__(self, seed: int, process_index: int = 0,
                 n_processes: int = 1):
        root = np.random.SeedSequence(int(seed))
        children = root.spawn(1 + max(int(n_processes), 1))
        self.shared = np.random.default_rng(children[0])
        self.local = np.random.default_rng(children[1 + int(process_index)])
        self.process_index = int(process_index)

    # ---- trajectory (de)serialization ----
    def dump(self) -> List[List[str]]:
        return [[json.dumps(self.shared.bit_generator.state),
                 json.dumps(self.local.bit_generator.state)]]

    def dump_all(self) -> List[List[str]]:
        """One [shared, local] pair PER PROCESS — parity with the
        reference's per-rank rng_state frames (include/io_maps.hpp:31-39).

        The shared stream is lockstep-identical on every process by
        construction, so only the local states need gathering; collective
        when multi-process (every process must call in step)."""
        import jax

        shared = json.dumps(self.shared.bit_generator.state)
        local = json.dumps(self.local.bit_generator.state)
        if jax.process_count() == 1:
            return [[shared, local]]
        from jax.experimental import multihost_utils

        allv = np.asarray(multihost_utils.process_allgather(
            _encode_str(local)))
        return [[shared, _decode_str(allv[i])]
                for i in range(allv.shape[0])]

    def load(self, rng_state: List[List[str]]) -> None:
        """Restore from a frame's rng_state.

        Multi-process frames carry one [shared, local] pair per rank; each
        process restores ITS pair. Like the reference, resuming assumes an
        unchanged process count (trajectory_reader.cpp:204-219) — a
        mismatch falls back to the last stored pair. Also accepts the
        earlier single-pair and single-stream layouts."""
        i = min(self.process_index, len(rng_state) - 1)
        shared, local = rng_state[i][0], rng_state[i][-1]
        self.shared.bit_generator.state = json.loads(shared)
        self.local.bit_generator.state = json.loads(local)
