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


def test_per_rank_dump_all_roundtrip_single_process():
    from skellysim_tpu.utils.rng import RNG

    r = RNG(123)
    r.shared.uniform(size=7)
    r.local.normal(size=3)
    frames = r.dump_all()
    assert len(frames) == 1 and len(frames[0]) == 2
    nxt = [r.shared.uniform(), r.local.uniform()]
    r2 = RNG(123)
    r2.load(frames)
    assert [r2.shared.uniform(), r2.local.uniform()] == nxt


def test_load_picks_own_rank_pair():
    """Multi-rank frames: process i restores pair i (io_maps.hpp:31-39)."""
    import json

    from skellysim_tpu.utils.rng import RNG

    # build two processes' states and a per-rank frame by hand
    r0 = RNG(9, process_index=0, n_processes=2)
    r1 = RNG(9, process_index=1, n_processes=2)
    r0.local.uniform(size=5)
    r1.local.uniform(size=11)
    shared = json.dumps(r0.shared.bit_generator.state)
    frame = [[shared, json.dumps(r0.local.bit_generator.state)],
             [shared, json.dumps(r1.local.bit_generator.state)]]
    expect0, expect1 = r0.local.uniform(), r1.local.uniform()
    f0 = RNG(9, process_index=0, n_processes=2)
    f1 = RNG(9, process_index=1, n_processes=2)
    f0.load(frame)
    f1.load(frame)
    assert f0.local.uniform() == expect0
    assert f1.local.uniform() == expect1
    assert f0.shared.uniform() == f1.shared.uniform()


def test_encode_decode_state_strings():
    from skellysim_tpu.utils.rng import _decode_str, _encode_str

    s = '{"some": "state", "n": 12345678901234567890}'
    assert _decode_str(_encode_str(s)) == s
