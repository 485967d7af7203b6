"""Spectral (Ewald) stokeslet evaluator: split exactness and parity vs dense.

The far-field tier replacing the reference's PVFMM/STKFMM
(docs/farfield_plan.md). Parity mirrors the reference's FMM-vs-CPU kernel
tests (kernel_test.cpp fmm rows), with tunable-accuracy tolerances."""

import numpy as np
import pytest

import jax.numpy as jnp

from skellysim_tpu.kernels import ewald
from skellysim_tpu.kernels.reference import stokeslet_apply


def test_split_is_exact():
    r2 = jnp.asarray(np.linspace(1e-4, 30.0, 2000))
    for a in (0.2, 0.7):
        fN, gN = ewald.near_coeffs(r2, a)
        fF, gF = ewald.far_coeffs(r2, a)
        plain = 1.0 / (8 * np.pi * np.sqrt(np.asarray(r2)))
        np.testing.assert_allclose(np.asarray(fN + fF), plain, atol=1e-14)
        np.testing.assert_allclose(np.asarray(gN + gF), plain, atol=1e-14)


def test_near_field_decays():
    a = 0.3
    r2 = jnp.asarray([(6.0 * a) ** 2])
    fN, gN = ewald.near_coeffs(r2, a)
    assert abs(float(fN[0])) < 1e-15
    assert abs(float(gN[0])) < 1e-15


def test_ewald_matches_dense_stokeslet():
    rng = np.random.default_rng(0)
    N = 500
    pts = jnp.asarray(rng.uniform(0, 2.0, (N, 3)))
    f = jnp.asarray(rng.normal(size=(N, 3)))
    extra = jnp.asarray(rng.uniform(0, 2.0, (40, 3)))
    trg = jnp.concatenate([pts, extra], axis=0)
    ew = ewald.EwaldStokeslet(lo=[0, 0, 0], hi=[2, 2, 2], a=0.25,
                              dtype=jnp.float64, cap=256)
    got = np.asarray(ew.apply(pts, f, trg, 0.7, n_self=N))
    want = np.asarray(stokeslet_apply(pts, f, trg, 0.7))
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 1e-4


def test_ewald_accuracy_envelope():
    """Far-field accuracy: the exponential-of-semicircle window with exact
    deconvolution and a seam-tapered Hockney tabulation reaches ~1e-6
    relative at points_per_a=3 — the same class as the reference's FMM
    multipole-order-8 settings (kernel_test.cpp fmm rows)."""
    rng = np.random.default_rng(1)
    N = 200
    pts = jnp.asarray(rng.uniform(0, 1.5, (N, 3)))
    f = jnp.asarray(rng.normal(size=(N, 3)))
    want = np.asarray(stokeslet_apply(pts, f, pts, 1.0))
    scale = np.abs(want).max()
    for ppa, tol in ((2.5, 3e-5), (3.0, 3e-6)):
        ew = ewald.EwaldStokeslet(lo=[0, 0, 0], hi=[1.5, 1.5, 1.5], a=0.25,
                                  points_per_a=ppa,
                                  dtype=jnp.float64, cap=256)
        got = np.asarray(ew.apply(pts, f, pts, 1.0, n_self=N))
        assert np.abs(got - want).max() / scale < tol
