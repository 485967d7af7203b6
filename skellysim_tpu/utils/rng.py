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


class RNG:
    def __init__(self, seed: int, process_index: int = 0,
                 n_processes: int = 1):
        root = np.random.SeedSequence(int(seed))
        children = root.spawn(1 + max(int(n_processes), 1))
        self.shared = np.random.default_rng(children[0])
        self.local = np.random.default_rng(children[1 + int(process_index)])

    # ---- trajectory (de)serialization ----
    def dump(self) -> List[List[str]]:
        return [[json.dumps(self.shared.bit_generator.state),
                 json.dumps(self.local.bit_generator.state)]]

    def load(self, rng_state: List[List[str]]) -> None:
        """Restore from a frame's rng_state.

        Accepts the current [[shared, local]] layout and the earlier
        single-stream frames (where both entries held the same state)."""
        shared, local = rng_state[0][0], rng_state[0][-1]
        self.shared.bit_generator.state = json.loads(shared)
        self.local.bit_generator.state = json.loads(local)
