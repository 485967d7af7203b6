"""Parity: Pallas tiled kernels (interpret mode on CPU) vs the f64 XLA oracle.

Mirrors the reference's GPU-vs-CPU kernel parity matrix
(tests/core/kernel_test.cpp:10-93); tolerance is f32-appropriate since the
Pallas path runs in f32 on the VPU."""

import numpy as np
import pytest

import jax.numpy as jnp

from skellysim_tpu.kernels.pallas_tpu import (
    stokeslet_apply_pallas,
    stresslet_apply_pallas,
)
from skellysim_tpu.kernels.reference import stokeslet_apply, stresslet_apply

RNG = np.random.default_rng(743)


@pytest.mark.parametrize("n_src,n_trg", [(100, 77), (600, 333), (1229, 743)])
def test_stokeslet_pallas_parity(n_src, n_trg):
    r_src = RNG.uniform(-1, 1, (n_src, 3))
    f = RNG.normal(size=(n_src, 3))
    r_trg = RNG.uniform(-1, 1, (n_trg, 3))
    want = np.asarray(stokeslet_apply(jnp.array(r_src), jnp.array(f), jnp.array(r_trg), 0.9))
    got = np.asarray(stokeslet_apply_pallas(
        jnp.array(r_src), jnp.array(f), jnp.array(r_trg), 0.9, interpret=True))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * scale)


def test_stokeslet_pallas_self_targets():
    # sources == targets: self-pairs must contribute zero, like the reference
    r = RNG.uniform(-1, 1, (300, 3))
    f = RNG.normal(size=(300, 3))
    want = np.asarray(stokeslet_apply(jnp.array(r), jnp.array(f), jnp.array(r), 1.0))
    got = np.asarray(stokeslet_apply_pallas(jnp.array(r), jnp.array(f), jnp.array(r),
                                            1.0, interpret=True))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * scale)


@pytest.mark.parametrize("n_src,n_trg", [(150, 90), (1229, 743)])
def test_stresslet_pallas_parity(n_src, n_trg):
    r_src = RNG.uniform(-1, 1, (n_src, 3))
    S = RNG.normal(size=(n_src, 3, 3))
    r_trg = RNG.uniform(-1, 1, (n_trg, 3))
    want = np.asarray(stresslet_apply(jnp.array(r_src), jnp.array(S), jnp.array(r_trg), 1.1))
    got = np.asarray(stresslet_apply_pallas(
        jnp.array(r_src), jnp.array(S), jnp.array(r_trg), 1.1, interpret=True))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=5e-5 * scale)


def test_source_block_split_matches_single_call(monkeypatch):
    """Above the VMEM source budget the wrappers sweep source blocks with
    separate pallas_calls and sum; shrink the budget so a small problem
    exercises the split (interpret mode, CPU)."""
    import skellysim_tpu.kernels.pallas_tpu as kp

    rng = np.random.default_rng(17)
    n_s, n_t = 1500, 300
    r_s = jnp.asarray(rng.uniform(-1, 1, (n_s, 3)))
    f = jnp.asarray(rng.normal(size=(n_s, 3)))
    S9 = jnp.asarray(rng.normal(size=(n_s, 3, 3)))
    r_t = jnp.asarray(rng.uniform(-1, 1, (n_t, 3)))
    ref_stk = kp.stokeslet_apply_pallas(r_s, f, r_t, 0.9, interpret=True)
    ref_str = kp.stresslet_apply_pallas(r_s, S9, r_t, 0.9, interpret=True)
    import jax

    monkeypatch.setattr(kp, "_VMEM_SRC_BUDGET_BYTES", 512 * 6 * 4)
    jax.clear_caches()   # the budget is read at trace time
    out_stk = kp.stokeslet_apply_pallas(r_s, f, r_t, 0.9, interpret=True)
    out_str = kp.stresslet_apply_pallas(r_s, S9, r_t, 0.9, interpret=True)
    assert kp._src_block(6) == 512   # the split actually engaged
    np.testing.assert_allclose(np.asarray(out_stk), np.asarray(ref_stk),
                               rtol=0, atol=1e-6 * np.abs(ref_stk).max())
    np.testing.assert_allclose(np.asarray(out_str), np.asarray(ref_str),
                               rtol=0, atol=1e-6 * np.abs(ref_str).max())
