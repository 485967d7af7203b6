"""Error-free transforms and compensated reductions (utils/compensated.py).

These primitives only work if XLA preserves the exact rounding of each
intermediate — an optimizer that simplifies (c - (c - a)) → a silently
destroys the Veltkamp split. Every test therefore runs THROUGH jit and
checks the mathematical exactness property itself, not a golden value.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skellysim_tpu.utils import compensated as cp

RNG = np.random.default_rng(7)


def _rand32(n, scale=1.0):
    return jnp.asarray(RNG.normal(size=n) * scale, jnp.float32)


def test_two_sum_exact_f32():
    a = _rand32(1000, 1.0)
    b = _rand32(1000, 1e-6)
    s, e = jax.jit(cp.two_sum)(a, b)
    # check exactness in f64: a + b == s + e bit-for-bit at f64 resolution
    a64, b64 = np.asarray(a, np.float64), np.asarray(b, np.float64)
    np.testing.assert_array_equal(a64 + b64,
                                  np.asarray(s, np.float64) + np.asarray(e, np.float64))


def test_two_prod_exact_f32():
    a = _rand32(1000)
    b = _rand32(1000)
    p, e = jax.jit(cp.two_prod)(a, b)
    a64, b64 = np.asarray(a, np.float64), np.asarray(b, np.float64)
    # f32 products fit exactly in f64, so the identity is testable exactly
    np.testing.assert_array_equal(a64 * b64,
                                  np.asarray(p, np.float64) + np.asarray(e, np.float64))


def test_dd_accumulation_beats_f32():
    """Summing n numbers of mixed magnitude: dd tree error ~2^-48, plain
    f32 error ~2^-24·√n."""
    n = 4096
    x = np.asarray(RNG.normal(size=n) * np.logspace(0, 6, n), np.float32)
    want = np.sum(np.asarray(x, np.float64))
    h, l = jax.jit(lambda v: cp.dd_sum(cp.dd_from(v), axis=0))(jnp.asarray(x))
    got = float(np.asarray(h, np.float64) + np.asarray(l, np.float64))
    plain = float(jnp.sum(jnp.asarray(x)))
    assert abs(got - want) / abs(want) < 1e-12
    assert abs(got - want) <= abs(plain - want)


def test_comp_dot_matches_f64():
    x = _rand32(10000)
    y = _rand32(10000)
    h, l = jax.jit(cp.comp_dot)(x, y)
    got = float(np.asarray(h, np.float64) + np.asarray(l, np.float64))
    want = float(np.dot(np.asarray(x, np.float64), np.asarray(y, np.float64)))
    assert abs(got - want) / max(abs(want), 1e-30) < 1e-12


def test_comp_norm_matches_f64():
    x = _rand32(10000, 3.0)
    got = float(jax.jit(cp.comp_norm)(x))
    want = float(np.linalg.norm(np.asarray(x, np.float64)))
    # plain-f32 return: accurate to its own half-ulp; the naive f32 norm
    # carries the √n accumulation error on top
    assert abs(got - want) / want < 2 ** -23


def test_dd_matvec_exact_vs_f64():
    """The dd matvec of f32-stored operands equals the f64 matvec of those
    same (rounded) operands — the property the increment-form fiber
    residual relies on (cancellation of β/dt terms at full precision)."""
    M = jnp.asarray(RNG.normal(size=(64, 64)) * 1e4, jnp.float32)
    x = jnp.asarray(RNG.normal(size=64), jnp.float32)
    h, l = jax.jit(cp.dd_matvec_f32exact)(M, x)
    want = np.asarray(M, np.float64) @ np.asarray(x, np.float64)
    got = np.asarray(h, np.float64) + np.asarray(l, np.float64)
    np.testing.assert_allclose(got, want, rtol=1e-13)


def test_dd_matvec_cancellation():
    """b − M x with b = M x computed in f64: the dd path recovers the tiny
    difference that plain f32 annihilates."""
    M = jnp.asarray(RNG.normal(size=(32, 32)) / 1e-4, jnp.float32)  # 1/dt scale
    x = jnp.asarray(RNG.normal(size=32), jnp.float32)
    bx = np.asarray(M, np.float64) @ np.asarray(x, np.float64)
    delta = 1e-9 * np.abs(bx)                  # increment-scale perturbation
    b = jnp.asarray(bx + delta, jnp.float32)   # rounded to f32

    def resid(M, x, b):
        h, l = cp.dd_matvec_f32exact(M, x)
        rh, rl = cp.dd_add_f((-h, -l), b)
        return rh + rl

    got = np.asarray(jax.jit(resid)(M, x, b), np.float64)
    want = np.asarray(b, np.float64) - bx
    # plain f32 evaluation loses these digits entirely; dd keeps them to
    # the f32 representation error of b itself
    np.testing.assert_allclose(got, want, atol=1e-11 * np.abs(bx).max())


def test_accurate_log_f32_series_accuracy():
    """The f32 series path: ~1-ulp against f64 np.log (the TPU's native f32
    log is only ~4e-6 — the reason this function exists)."""
    x = jnp.asarray(RNG.uniform(1e-6, 1e6, 4096), jnp.float32)
    got = np.asarray(cp.accurate_log(x), np.float64)
    want = np.log(np.asarray(x, np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-7)


def test_accurate_log_f64_native_fallback():
    """f64 inputs take the native-log branch (regression: the f64 frexp
    path lowers to an s64 bitcast that XLA:TPU's X64 rewriter rejects,
    which broke the driver's on-chip entry() compile check; r4 commit)."""
    x = jnp.asarray(RNG.uniform(1e-6, 1e6, 1024), jnp.float64)
    got = np.asarray(cp.accurate_log(x))
    want = np.log(np.asarray(x))
    np.testing.assert_allclose(got, want, rtol=5e-16)
    # and it must be jittable without frexp appearing in the HLO
    hlo = jax.jit(cp.accurate_log).lower(x).as_text()
    assert "bitcast" not in hlo.lower()
