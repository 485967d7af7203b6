"""Shared/distributed RNG streams (trng split, src/core/rng.cpp:18-32)."""

import numpy as np

from skellysim_tpu.utils.rng import RNG


def test_shared_stream_agrees_across_processes():
    a = RNG(42, process_index=0, n_processes=4)
    b = RNG(42, process_index=3, n_processes=4)
    assert a.shared.uniform() == b.shared.uniform()
    assert a.shared.poisson(5.0) == b.shared.poisson(5.0)


def test_local_stream_is_process_unique():
    a = RNG(42, process_index=0, n_processes=4)
    b = RNG(42, process_index=3, n_processes=4)
    assert a.local.uniform() != b.local.uniform()


def test_state_round_trip():
    a = RNG(7)
    a.shared.uniform(size=5)
    a.local.normal(size=3)
    saved = a.dump()
    want = (a.shared.uniform(), a.local.uniform())
    b = RNG(999)
    b.load(saved)
    got = (b.shared.uniform(), b.local.uniform())
    assert want == got


def test_loads_legacy_single_stream_frames():
    import json
    g = np.random.default_rng(3)
    state = json.dumps(g.bit_generator.state)
    r = RNG(1)
    r.load([[state, state]])
    want = np.random.default_rng(3).uniform()
    assert r.shared.uniform() == want
    assert r.local.uniform() == np.random.default_rng(3).uniform()
