"""Parity tests for the pure-XLA pairwise kernels against brute-force numpy.

Analogue of the reference's kernel_test.cpp (CPU reference vs other drivers,
tolerance 5e-9-class): here numpy loops are the ground truth and the XLA
kernels must match in f64."""

import numpy as np
import pytest

import jax.numpy as jnp

from skellysim_tpu.kernels import (
    oseen_tensor,
    rotlet_apply,
    stokeslet_apply,
    stresslet_apply,
    stresslet_times_normal,
    stresslet_times_normal_times_density,
)

RNG = np.random.default_rng(1229)


def _points(n, scale=1.0):
    return RNG.uniform(-scale, scale, size=(n, 3))


def _np_stokeslet(r_src, f, r_trg, eta):
    u = np.zeros((len(r_trg), 3))
    for t in range(len(r_trg)):
        for s in range(len(r_src)):
            d = r_trg[t] - r_src[s]
            r2 = d @ d
            if r2 == 0.0:
                continue
            r = np.sqrt(r2)
            u[t] += f[s] / r + (d @ f[s]) * d / r**3
    return u / (8 * np.pi * eta)


def _np_stresslet(r_src, S, r_trg, eta):
    u = np.zeros((len(r_trg), 3))
    for t in range(len(r_trg)):
        for s in range(len(r_src)):
            d = r_trg[t] - r_src[s]
            r2 = d @ d
            if r2 == 0.0:
                continue
            u[t] += -3.0 * (d @ S[s] @ d) * d / r2**2.5
    return u / (8 * np.pi * eta)


def _np_rotlet(r_src, g, r_trg, eta):
    u = np.zeros((len(r_trg), 3))
    for t in range(len(r_trg)):
        for s in range(len(r_src)):
            d = r_trg[t] - r_src[s]
            r = np.sqrt(d @ d)
            if r == 0.0:
                continue
            u[t] += np.cross(g[s], d) / r**3
    return u / (8 * np.pi * eta)


@pytest.mark.parametrize("eta", [1.0, 0.7])
def test_stokeslet_matches_numpy(eta):
    r_src, r_trg = _points(61), _points(43)
    f = RNG.normal(size=(61, 3))
    got = stokeslet_apply(jnp.array(r_src), jnp.array(f), jnp.array(r_trg), eta)
    np.testing.assert_allclose(np.asarray(got), _np_stokeslet(r_src, f, r_trg, eta), atol=5e-9)


def test_stokeslet_self_term_zero():
    r = _points(17)
    f = RNG.normal(size=(17, 3))
    u_self = stokeslet_apply(jnp.array(r), jnp.array(f), jnp.array(r))
    assert np.all(np.isfinite(np.asarray(u_self)))


def test_stokeslet_chunked_matches_unchunked():
    r_src, r_trg = _points(50), _points(37)
    f = RNG.normal(size=(50, 3))
    a = stokeslet_apply(jnp.array(r_src), jnp.array(f), jnp.array(r_trg))
    b = stokeslet_apply(jnp.array(r_src), jnp.array(f), jnp.array(r_trg), target_chunk=8)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


@pytest.mark.parametrize("eta", [1.0, 1.3])
def test_stresslet_matches_numpy(eta):
    r_src, r_trg = _points(29), _points(31)
    S = RNG.normal(size=(29, 3, 3))
    got = stresslet_apply(jnp.array(r_src), jnp.array(S), jnp.array(r_trg), eta)
    np.testing.assert_allclose(np.asarray(got), _np_stresslet(r_src, S, r_trg, eta), atol=5e-9)


def test_rotlet_matches_numpy():
    r_src, r_trg = _points(19), _points(23)
    g = RNG.normal(size=(19, 3))
    got = rotlet_apply(jnp.array(r_src), jnp.array(g), jnp.array(r_trg), 0.9)
    np.testing.assert_allclose(np.asarray(got), _np_rotlet(r_src, g, r_trg, 0.9), atol=5e-9)


def test_oseen_tensor_consistent_with_stokeslet_apply():
    # G @ f (flattened) must equal the direct stokeslet apply when no pair is
    # inside the regularization radius
    r_src, r_trg = _points(21), _points(18)
    f = RNG.normal(size=(21, 3))
    G = np.asarray(oseen_tensor(jnp.array(r_src), jnp.array(r_trg), 0.8))
    u_mat = (G @ f.reshape(-1)).reshape(-1, 3)
    u_dir = np.asarray(stokeslet_apply(jnp.array(r_src), jnp.array(f), jnp.array(r_trg), 0.8))
    np.testing.assert_allclose(u_mat, u_dir, atol=1e-11)


def test_oseen_tensor_symmetry_and_zero_diag():
    r = _points(15)
    G = np.asarray(oseen_tensor(jnp.array(r), jnp.array(r)))
    np.testing.assert_allclose(G, G.T, atol=1e-12)
    for i in range(15):
        np.testing.assert_allclose(G[3 * i:3 * i + 3, 3 * i:3 * i + 3], 0.0)


def test_stresslet_times_normal_consistency():
    # the dense operator contracted with a density must match the direct
    # density contraction routine
    r = _points(13)
    n = RNG.normal(size=(13, 3))
    q = RNG.normal(size=(13, 3))
    M = np.asarray(stresslet_times_normal(jnp.array(r), jnp.array(n)))
    direct = np.asarray(
        stresslet_times_normal_times_density(jnp.array(r), jnp.array(n), jnp.array(q))
    )
    via_matrix = (M @ q.reshape(-1)).reshape(-1, 3)
    np.testing.assert_allclose(via_matrix, direct, atol=1e-11)


def test_stresslet_times_normal_matches_doublelayer_apply():
    # S = 2 eta n⊗q through the stresslet evaluator == stresslet_times_normal
    # operator/(…) identity used by Periphery::flow (periphery.cpp:61-74)
    r = _points(11)
    trg = _points(9)
    n = RNG.normal(size=(11, 3))
    q = RNG.normal(size=(11, 3))
    eta = 1.7
    S = 2.0 * eta * n[:, :, None] * q[:, None, :]
    u = np.asarray(stresslet_apply(jnp.array(r), jnp.array(S), jnp.array(trg), eta))
    want = np.zeros((9, 3))
    for t in range(9):
        for s in range(11):
            d = trg[t] - r[s]
            r5 = (d @ d) ** 2.5
            want[t] += (-3 / (4 * np.pi)) * (d @ q[s]) * (d @ n[s]) * d / r5
    np.testing.assert_allclose(u, want, atol=5e-9)
