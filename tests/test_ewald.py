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


def test_stresslet_split_is_exact():
    """Near + far stresslet coefficients reconstruct −3/(4π) didjdk/r⁵
    exactly (symbolic identity T = ∂S+∂S−δP with the blob pressure)."""
    rng = np.random.default_rng(2)
    a = 0.3
    r2 = jnp.asarray(np.linspace(1e-3, 20.0, 500))
    An, Bn, Cn = ewald.stresslet_near_coeffs(r2, a)
    Af, Bf, Cf = ewald.stresslet_far_coeffs(r2, a)
    # A, B cancel (full kernel has none); C sums to the full coefficient
    np.testing.assert_allclose(np.asarray(An + Af), 0.0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(Bn + Bf), 0.0, atol=1e-14)
    want_C = -3.0 / (4.0 * np.pi * np.asarray(r2) ** 2.5)
    np.testing.assert_allclose(np.asarray(Cn + Cf), want_C, rtol=1e-10)


def test_stresslet_near_decays():
    a = 0.3
    r2 = jnp.asarray([(6.0 * a) ** 2])
    for c in ewald.stresslet_near_coeffs(r2, a):
        assert abs(float(c[0])) < 1e-14


def test_ewald_stresslet_matches_dense():
    from skellysim_tpu.kernels.reference import stresslet_apply

    rng = np.random.default_rng(3)
    N = 250
    a = 0.25
    eta = 0.9
    src = jnp.asarray(rng.uniform(0, 1.8, (N, 3)))
    trg = jnp.concatenate([src, jnp.asarray(rng.uniform(0, 1.8, (30, 3)))], 0)
    nrm = jnp.asarray(rng.normal(size=(N, 3)))
    q = jnp.asarray(rng.normal(size=(N, 3)))
    S = nrm[:, :, None] * q[:, None, :]
    want = np.asarray(stresslet_apply(src, S, trg, eta))
    es = ewald.EwaldStresslet(lo=[0, 0, 0], hi=[1.8] * 3, a=a,
                              points_per_a=3.0, dtype=jnp.float64, cap=256)
    got = np.asarray(es.apply(src, S, trg, eta))
    assert np.abs(got - want).max() / np.abs(want).max() < 3e-6


def test_slab_spread_interp_match_scatter_gather():
    """The TPU slab-matmul spread/interp are the same operators as the
    scatter-add / flat-gather pair (the CPU path)."""
    rng = np.random.default_rng(5)
    N = 1500
    r = jnp.asarray(rng.uniform(0.2, 1.8, (N, 3)))
    f = jnp.asarray(rng.normal(size=(N, 3)))
    ew = ewald.EwaldStokeslet(lo=[0, 0, 0], hi=[2, 2, 2], a=0.15,
                              dtype=jnp.float64)
    g = ew.grid
    L = tuple(g.logical)
    grids = ewald._spread_scatter(r, f, g.lo, g.h, g.sigma, g.shape, g.support)
    grids2 = ewald._pad_to(
        ewald._spread_slab(r, f, g.lo, g.h, L, g.support), g.shape)
    derr = float(jnp.abs(grids - grids2).max())
    assert derr < 1e-12 * (float(jnp.abs(grids).max()) + 1), derr

    ug = ewald._far_convolve(grids, g.khat)
    u1 = np.asarray(ewald._interp_gather(ug, r, g.lo, g.h, g.sigma, g.support))
    u2 = np.asarray(ewald._interp_slab(ug[:, :L[0], :L[1], :L[2]], r,
                                       g.lo, g.h, g.support))
    assert np.abs(u1 - u2).max() < 1e-12 * (np.abs(u1).max() + 1)


def test_logical_convolves_match_batch():
    """The channel-at-a-time (memory-bounded) k-space convolves equal the
    batch forms on the occupied extent, for both kernels."""
    rng = np.random.default_rng(7)
    ew = ewald.EwaldStokeslet(lo=[0, 0, 0], hi=[1.5, 1.5, 1.5], a=0.2,
                              dtype=jnp.float64)
    g = ew.grid
    L = tuple(g.logical)
    glog = jnp.asarray(rng.normal(size=(3,) + L))
    full = ewald._far_convolve(ewald._pad_to(glog, g.shape), g.khat)
    part = ewald._far_convolve_logical(glog, g.khat, g.shape, L)
    assert np.abs(np.asarray(full[:, :L[0], :L[1], :L[2]] - part)).max() < 1e-10

    Dlog = jnp.asarray(rng.normal(size=(6,) + L))
    fullS = ewald._far_stresslet_convolve(ewald._pad_to(Dlog, g.shape),
                                          g.khat, g.phihat, g.shape,
                                          g.support, g.h)
    partS = ewald._far_stresslet_convolve_logical(Dlog, g.khat, g.phihat,
                                                  g.shape, L, g.h)
    assert np.abs(np.asarray(fullS[:, :L[0], :L[1], :L[2]] - partS)).max() < 1e-10


def test_far_plan_reuse_matches_internal_binning(monkeypatch):
    """apply_with(far_plan=make_far_plan(...)) must be bit-identical to the
    internal per-apply binning (the plan is the same computation hoisted out
    of the GMRES loop). The slab path is accelerator-default; force it on
    CPU for the check."""
    import numpy as np

    from skellysim_tpu.kernels import ewald

    monkeypatch.setattr(ewald, "_use_slab", lambda: True)
    rng = np.random.default_rng(11)
    N = 800
    r = jnp.asarray(rng.uniform(0, 3.0, (N, 3)), jnp.float32)
    f = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    ew = ewald.EwaldStokeslet(lo=[0, 0, 0], hi=[3, 3, 3], a=0.3,
                              points_per_a=2.5, dtype=jnp.float32,
                              pair_total=16384)
    sp = ew.spectra()
    plan = ew.make_near_plan(r, r)
    far = ew.make_far_plan(r, r)
    assert far is not None
    # the bins themselves are bit-identical (asserted below); the velocities
    # may differ at f32 fusion-rounding level because threading bins as
    # arguments changes XLA's fusion/summation order
    from skellysim_tpu.kernels.ewald import (_slab_bins, _slab_CP, _slab_cap,
                                             _slab_entry_bound)

    g = ew.grid
    Gx = int(g.logical[0])
    cap = _slab_cap(N, Gx)
    CP = _slab_CP(cap)
    E = _slab_entry_bound(N, Gx, CP)
    internal = _slab_bins(r, g.h, g.lo, Gx, cap, CP, E, r.dtype, g.support)
    for a_int, a_plan in zip(internal, far[0]):
        np.testing.assert_array_equal(np.asarray(a_int), np.asarray(a_plan))

    u0 = np.asarray(ew.apply_with(sp, r, f, r, 1.0, plan=plan))
    u1 = np.asarray(ew.apply_with(sp, r, f, r, 1.0, plan=plan, far_plan=far))
    scale = np.abs(u0).max()
    assert np.abs(u0 - u1).max() < 1e-5 * scale


def test_tabulate_component_chunked_matches_single():
    """The x-slab / y-slab streamed tabulation (the 1M-OOM fix) must match
    the single-shot pass to FFT roundoff on every component."""
    g = ewald.build_grid(np.zeros(3), np.full(3, 1.6), a=0.4,
                         points_per_a=2.5, dtype=jnp.float64)
    padded = g.shape
    # rebuild the 1-D inputs exactly as build_grid does, then compare
    # chunked vs unchunked tabulation of two representative components
    # (even-even diag 0, odd-odd off-diag 1) and phi (6)
    import jax

    comp = jnp.float64
    axes = [np.fft.fftfreq(p, d=1.0 / p) * g.h for p in padded]
    from scipy.special import erfc as _erfc
    w_t = 2.2 * g.h
    tapers = []
    for axis in range(3):
        lim = (g.logical[axis] - 1) * g.h
        tapers.append(0.5 * _erfc((np.abs(axes[axis]) - lim - 5 * w_t) / w_t))
    # identity window spectra isolate the FFT/chunk plumbing (z is the
    # rfft half-axis)
    ones = [np.ones(padded[0]), np.ones(padded[1]),
            np.ones(padded[2] // 2 + 1)]
    one_d = [jnp.asarray(v, comp) for v in
             (axes[0], axes[1], axes[2], tapers[0], tapers[1], tapers[2],
              ones[0], ones[1], ones[2])]
    for idx in (0, 1, 6):
        ref = ewald._tabulate_component(0.4, idx, *one_d)
        chk = ewald._tabulate_component(0.4, idx, *one_d,
                                        n_chunks=4, m_chunks=2)
        scale = float(jnp.max(jnp.abs(ref)))
        assert float(jnp.max(jnp.abs(chk - ref))) < 1e-12 * scale


def test_spectra_are_real_tuple_and_sized():
    """Real-only storage contract: khat is 6 real half-spectra, phihat one,
    and grid_shape_for/spectra_bytes agree with what build_grid built."""
    lo, hi = np.zeros(3), np.full(3, 1.6)
    g = ewald.build_grid(lo, hi, a=0.4, points_per_a=2.5, dtype=jnp.float64)
    assert isinstance(g.khat, tuple) and len(g.khat) == 6
    fft_shape = (g.shape[0], g.shape[1], g.shape[2] // 2 + 1)
    for c in g.khat:
        assert not jnp.iscomplexobj(c)
        assert c.shape == fft_shape
    assert g.phihat.shape == fft_shape
    shape, padded, h, support, _ = ewald.grid_shape_for(lo, hi, 0.4, 2.5)
    assert padded == g.shape and shape == g.logical
    want = 7 * fft_shape[0] * fft_shape[1] * fft_shape[2] * 8
    assert ewald.spectra_bytes(lo, hi, 0.4, 2.5, itemsize=8) == want
    # budget knob direction: growing a must shrink the spectra
    assert (ewald.spectra_bytes(lo, hi, 0.8, 2.5)
            < ewald.spectra_bytes(lo, hi, 0.4, 2.5))


def test_sequential_convolve_matches_batch(monkeypatch):
    """The ≥1e6-regime memory-bounded convolves (one component in flight
    behind optimization barriers) must match the co-scheduled forms to
    rounding: same sums reordered. Regression for the 1M-point compile OOM
    (chip_logs r4b2: 17 co-resident half-grid temps, 3 GB over HBM)."""
    import jax

    monkeypatch.setenv("SKELLY_SLAB", "1")
    rng = np.random.default_rng(3)
    N = 400
    r = jnp.asarray(rng.uniform(0, 3.0, (N, 3)), jnp.float32)
    f = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    q = rng.normal(size=(N, 3))
    S = jnp.asarray(q[:, :, None] * rng.normal(size=(N, 3))[:, None, :],
                    jnp.float32)
    stk = ewald.EwaldStokeslet(lo=[0, 0, 0], hi=[3, 3, 3], a=0.25,
                               dtype=jnp.float32)
    st = ewald.EwaldStresslet(grid=stk.grid, lo=[0, 0, 0], hi=[3, 3, 3],
                              a=0.25, dtype=jnp.float32)
    u0, v0 = np.asarray(stk.apply(r, f, r)), np.asarray(st.apply(r, S, r))
    monkeypatch.setattr(ewald, "_SEQ_CONVOLVE_CELLS", 1)
    jax.clear_caches()
    u1, v1 = np.asarray(stk.apply(r, f, r)), np.asarray(st.apply(r, S, r))
    assert np.abs(u1 - u0).max() <= 1e-6 * np.abs(u0).max()
    assert np.abs(v1 - v0).max() <= 1e-6 * np.abs(v0).max()


def test_tabulate_all_matches_components():
    """The one-program batched tabulation (warm-init lever) must equal the
    per-component jits bit-for-bit."""
    import numpy as np

    from skellysim_tpu.kernels import ewald

    rng = np.random.default_rng(3)
    G = (16, 12, 20)
    axes = [np.fft.fftfreq(p, d=1.0 / p) * 0.1 for p in G]
    tapers = [np.ones(p) for p in G]
    wks = [np.abs(rng.normal(size=(G[0],))) + 0.5,
           np.abs(rng.normal(size=(G[1],))) + 0.5,
           np.abs(rng.normal(size=(G[2] // 2 + 1,))) + 0.5]  # rfft half
    one_d = [jnp.asarray(v, jnp.float64) for v in (*axes, *tapers, *wks)]
    allc = ewald._tabulate_all(0.4, *one_d)
    assert len(allc) == 7
    for idx in range(7):
        ref = np.asarray(ewald._tabulate_component(0.4, idx, *one_d))
        # one fused program vs seven: fusion boundaries differ, so match
        # to f64 roundoff rather than bitwise
        np.testing.assert_allclose(np.asarray(allc[idx]), ref, rtol=0,
                                   atol=1e-12 * np.abs(ref).max())
