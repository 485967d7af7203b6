"""Free-space spectral (Ewald-type) stokeslet evaluation — the O(N) far field.

The TPU-native replacement for the reference's PVFMM/STKFMM far-field tier
(docs/farfield_plan.md). The stokeslet splits exactly via the Hasimoto
screen (a Gaussian-derived blob with vanishing second moment):

    S(r) = S_near(r; a) + S_far(r; a),    S = f(r) δ + g(r) r̂ r̂ᵀ, and

    f_far  = erf(ρ)/(8πr) + e^{−ρ²}/(4π^{3/2}a)
    g_far  = erf(ρ)/(8πr) − e^{−ρ²}/(4π^{3/2}a)
    f_near = erfc(ρ)/(8πr) − e^{−ρ²}/(4π^{3/2}a)
    g_near = erfc(ρ)/(8πr) + e^{−ρ²}/(4π^{3/2}a),      ρ = r/a

(derived symbolically from ∇⁴B = −γ_screen; the near field decays like
e^{−ρ²}, ~1e−16 by r = 6a). Evaluation:

  * far field: Gaussian-window spreading of forces onto a regular grid,
    aperiodic convolution with the *numerically tabulated* S_far on a
    2×-padded grid (free space — no images, no analytic Fourier symbol
    needed), Fourier-side division by the spreading window squared
    (NUFFT-style deconvolution), interpolation back at targets. FFTs,
    elementwise multiplies, and windowed gathers — all dense regular work.
  * near field: cell-list pairwise evaluation of the screened kernel over
    27-cell neighborhoods, each a small dense block.

Cost: O(N·W³) spreading + O(M log M) FFT + O(N·ρ̄) near field — linear in N
at fixed density, vs O(N²) for the dense evaluators.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_INV_8PI = 1.0 / (8.0 * math.pi)
_INV_4PI32 = 1.0 / (4.0 * math.pi**1.5)


# ---- kernel splitting ----

def near_coeffs(r2: jax.Array, a: float):
    """(f_near, g_near) with the self-pair (r = 0) excluded."""
    nonzero = r2 > 0.0
    r = jnp.sqrt(jnp.where(nonzero, r2, 1.0))
    rho = r / a
    erfc = jax.lax.erfc(rho)
    gauss = jnp.exp(-rho * rho) * (_INV_4PI32 / a)
    f = _INV_8PI * erfc / r - gauss
    g = _INV_8PI * erfc / r + gauss
    f = jnp.where(nonzero, f, 0.0)
    g = jnp.where(nonzero, g, 0.0)
    return f, g


def far_coeffs(r2: jax.Array, a: float):
    """(f_far, g_far); smooth everywhere, f_far(0) = 1/(2π^{3/2}a)."""
    r = jnp.sqrt(r2)
    rho = r / a
    small = rho < 1e-6
    # erf(ρ)/(8πr) → 1/(4π^{3/2} a) as r→0
    erf_term = jnp.where(small, 1.0 / (4.0 * math.pi**1.5 * a),
                         _INV_8PI * jax.lax.erf(rho) / jnp.where(small, 1.0, r))
    gauss = jnp.exp(-rho * rho) * (_INV_4PI32 / a)
    return erf_term + gauss, erf_term - gauss


# The stresslet splits through the same blob via the identity
#   T_ijk = ∂_k S_ij + ∂_j S_ik − δ_jk P_i,   P_i = −∂_i φ,  ∇²φ = −γ_blob
# (verified symbolically; φ = erf(ρ)/(4πr) + e^{−ρ²}/(4π^{3/2}a)). Writing
#   T = A δ_jk r̂_i + B (δ_ij r̂_k + δ_ik r̂_j) + C r̂_i r̂_j r̂_k,
# the screened (far) coefficients come out strikingly simple:
#   A_far = B_far = −r e^{−ρ²} / (2π^{3/2} a³)
#   C_far = −3erf(ρ)/(4πr²) + 3e^{−ρ²}/(2π^{3/2} a r) + r e^{−ρ²}/(π^{3/2} a³)
# The full kernel has A = B = 0, C = −3/(4πr²), so the near field is the
# complement; all near coefficients decay like e^{−ρ²} (C_far → C_full with
# Gaussian-fast residual), and T_far(0) = 0 — the far grid contributes no
# self term. These are 8π/η-free; callers scale by 1/(2η) to match
# reference.py's stresslet convention u = −3/(8πη)(d·S·d)d/r⁵.

def stresslet_near_coeffs(r2: jax.Array, a: float):
    """(A/r, B/r, C/r³) of the NEAR stresslet; self-pairs excluded.

    Returned pre-divided so the contraction uses raw displacement vectors:
    u = (A/r)·tr(S)·d + (B/r)·[(q·d)n + (n·d)q] + (C/r³)·(n·d)(q·d)·d.
    """
    nonzero = r2 > 0.0
    r2s = jnp.where(nonzero, r2, 1.0)
    r = jnp.sqrt(r2s)
    rho = r / a
    gauss = jnp.exp(-rho * rho)
    c3 = 1.0 / (2.0 * math.pi**1.5 * a**3)
    A_r = c3 * gauss                              # A_near/r (smooth)
    erfc = jax.lax.erfc(rho)
    # C_near/r³ = [−3erfc(ρ)/(4πr²) − 3e^{−ρ²}/(2π^{3/2}ar) − re^{−ρ²}/(π^{3/2}a³)]/r³
    C_r3 = (-3.0 * erfc / (4.0 * math.pi * r2s)
            - 3.0 * gauss / (2.0 * math.pi**1.5 * a * r)
            - 2.0 * c3 * r * gauss) / (r2s * r)
    A_r = jnp.where(nonzero, A_r, 0.0)
    C_r3 = jnp.where(nonzero, C_r3, 0.0)
    return A_r, A_r, C_r3


def stresslet_far_coeffs(r2: jax.Array, a: float):
    """(A/r, B/r, C/r³) of the FAR stresslet; smooth, →0 at r = 0."""
    r2s = jnp.where(r2 > 0.0, r2, 1.0)
    r = jnp.sqrt(r2s)
    rho = jnp.sqrt(r2) / a
    gauss = jnp.exp(-rho * rho)
    c3 = 1.0 / (2.0 * math.pi**1.5 * a**3)
    A_r = -c3 * gauss
    small = rho < 1e-4
    erf = jax.lax.erf(rho)
    # C_far/r³ → −2/(5π^{3/2}a⁵) as r → 0 (three O(1/r) terms cancel to O(r³))
    C_r3 = jnp.where(small, -2.0 / (5.0 * math.pi**1.5 * a**5),
                     (-3.0 * erf / (4.0 * math.pi * r2s)
                      + 3.0 * gauss / (2.0 * math.pi**1.5 * a * r)
                      + 2.0 * c3 * r * gauss) / (r2s * r))
    return A_r, A_r, C_r3


# ---- grid machinery ----

class EwaldGrid(NamedTuple):
    lo: jax.Array          # (3,) grid origin
    h: float               # grid spacing
    shape: tuple           # (3,) logical grid points
    sigma: float           # spreading-window std dev
    support: int           # window width in cells (odd)
    khat: tuple            # 6 × (*fft_shape) far-kernel spectra, REAL floats
                           # (xx,xy,xz,yy,yz,zz). Every tabulated component
                           # is even or odd per axis, so its DFT is purely
                           # real (odd axes pair up: i² = −1); the seam
                           # taper kills the unpaired Nyquist samples to
                           # ~1e-12, making the real part exact. Half the
                           # storage of a complex spectrum, and the
                           # convolve's khat·f̂ products are real×complex.
    a: float
    phihat: jax.Array = None  # (*fft_shape) blob pressure potential
                              # spectrum, real (even kernel)
    logical: tuple = None  # (3,) occupied (unpadded) grid extent


def _round_up_fft(n: int) -> int:
    """Next 2^a·3^b·5^c ≥ n (FFT-friendly sizes)."""
    best = 1 << (n - 1).bit_length()
    p3 = 1
    while p3 <= best:
        p5 = 1
        while p3 * p5 <= best:
            v = p3 * p5
            while v < n:
                v *= 2
            best = min(best, v)
            p5 *= 5
        p3 *= 3
    return best


def _kernel_component(idx, a, X, Y, Z):
    """idx-th far-kernel component on an offset grid: 0..5 the screened
    stokeslet S_far (xx,xy,xz,yy,yz,zz), 6 the blob pressure potential
    φ = erf(ρ)/(4πr) + e^{−ρ²}/(4π^{3/2}a) completing the screened
    stresslet T_far = ∂S_far + ∂S_far + δ ∂φ (see stresslet_far_coeffs)."""
    r2 = X * X + Y * Y + Z * Z
    r = jnp.sqrt(r2)
    rho = r / a
    rsafe = jnp.where(r > 0, r, 1.0)
    if idx == 6:
        return jnp.where(rho < 1e-12, 3.0 / (4.0 * math.pi**1.5 * a),
                         jax.lax.erf(rho) / (4.0 * math.pi * rsafe)
                         + jnp.exp(-rho * rho) / (4.0 * math.pi**1.5 * a))
    erf_term = jnp.where(rho < 1e-12, 1.0 / (4.0 * math.pi**1.5 * a),
                         _INV_8PI * jax.lax.erf(rho) / rsafe)
    gauss = jnp.exp(-rho * rho) * (_INV_4PI32 / a)
    g_r2 = (erf_term - gauss) / jnp.where(r2 > 0, r2, 1.0)
    g_r2 = jnp.where(r2 > 0, g_r2, 0.0)
    A, B = [(X, X), (X, Y), (X, Z), (Y, Y), (Y, Z), (Z, Z)][idx]
    out = g_r2 * A * B
    if idx in (0, 3, 5):
        # at r = 0: g → 0 smoothly, diagonal → f_far(0)
        out = out + erf_term + gauss
    return out


def _tabulate_one(a, idx, axx, axy, axz, tx, ty, tz, wkx, wky, wkz,
                  n_chunks=1, m_chunks=1):
    """Tabulation body of ONE deconvolved far-kernel spectrum (see
    ``_tabulate_component``); call under an outer jit."""
    comp_dt = axx.dtype
    Gx, Gy, Gz = axx.shape[0], axy.shape[0], axz.shape[0]
    Gzr = Gz // 2 + 1
    cdt = jnp.complex128 if comp_dt == jnp.float64 else jnp.complex64
    cx = Gx // n_chunks
    cy = Gy // m_chunks

    def pass1(i, buf):
        x = jax.lax.dynamic_slice_in_dim(axx, i * cx, cx)
        tX = jax.lax.dynamic_slice_in_dim(tx, i * cx, cx)
        V = _kernel_component(idx, a, x[:, None, None], axy[None, :, None],
                              axz[None, None, :])
        V = V * (tX[:, None, None] * ty[None, :, None] * tz[None, None, :])
        Vh = jnp.fft.fft(jnp.fft.rfft(V, axis=2), axis=1)
        return jax.lax.dynamic_update_slice_in_dim(buf, Vh.astype(cdt),
                                                   i * cx, axis=0)

    buf = jnp.zeros((Gx, Gy, Gzr), cdt)
    buf = (jax.lax.fori_loop(0, n_chunks, pass1, buf) if n_chunks > 1
           else pass1(0, buf))

    def pass2(j, out):
        yb = jax.lax.dynamic_slice_in_dim(buf, j * cy, cy, axis=1)
        kh = jnp.fft.fft(yb, axis=0).real.astype(comp_dt)
        wy = jax.lax.dynamic_slice_in_dim(wky, j * cy, cy)
        wk2 = (wkx[:, None, None] * wy[None, :, None]
               * wkz[None, None, :]) ** 2
        # modes where the window has no support are unresolvable: zero
        # them rather than amplifying into overflow
        keep = jnp.abs(wk2) > 1e-9
        kh = jnp.where(keep, kh / jnp.where(keep, wk2, 1.0), 0.0)
        return jax.lax.dynamic_update_slice_in_dim(out, kh, j * cy, axis=1)

    out = jnp.zeros((Gx, Gy, Gzr), comp_dt)
    return (jax.lax.fori_loop(0, m_chunks, pass2, out) if m_chunks > 1
            else pass2(0, out))


@partial(jax.jit, static_argnames=("a", "idx", "n_chunks", "m_chunks"))
def _tabulate_component(a, idx, axx, axy, axz, tx, ty, tz, wkx, wky, wkz,
                        n_chunks=1, m_chunks=1):
    """Device-side tabulation of ONE deconvolved far-kernel spectrum.

    All 3-D work (kernel tabulation on the padded grid, the seam taper,
    the rFFT, window deconvolution) runs where the evaluator will run;
    only the 1-D axis offsets, tapers, and window spectra are inputs. This
    matters on remote accelerators: the spectra are GB-scale at 1e6-point
    grids, the 1-D inputs are KB.

    Memory discipline (the round-3 1M-point OOM was ~20 co-resident
    full-grid FFT temps, docs/chip_logs/r3c/oocyte_1m.err): components are
    tabulated ONE AT A TIME (separate jit calls free each component's
    temps), the z/y transforms stream over x-slabs (``n_chunks``), the x
    transform + deconvolution stream over y-slabs (``m_chunks``), and only
    the REAL part is kept — every component is even or odd per axis, so
    its DFT is real up to the taper-killed Nyquist samples (~1e-12).
    """
    return _tabulate_one(a, idx, axx, axy, axz, tx, ty, tz, wkx, wky, wkz,
                         n_chunks, m_chunks)


@partial(jax.jit, static_argnames=("a", "n_chunks", "m_chunks"))
def _tabulate_all(a, axx, axy, axz, tx, ty, tz, wkx, wky, wkz,
                  n_chunks=1, m_chunks=1):
    """All 7 spectra in ONE compiled program (warm-init lever, VERDICT r4
    #9: seven separate jits cost seven compile round-trips on the tunneled
    remote-compile backend — 60-85 s of the warm oocyte init). Components
    still run sequentially behind optimization barriers so their FFT temps
    never co-reside (same discipline as ``_tabulate_component``)."""
    outs = []
    for idx in range(7):
        out = _tabulate_one(a, idx, axx, axy, axz, tx, ty, tz,
                            wkx, wky, wkz, n_chunks, m_chunks)
        outs.append(out)
        # pin the schedule: component idx completes (and its temps die)
        # before component idx+1 starts
        outs = list(jax.lax.optimization_barrier(tuple(outs)))
    return tuple(outs)


def _pow2_chunks(G: int, cells: int, target: float, cap: int = 32) -> int:
    """Largest power-of-2 chunk count dividing ``G`` that brings a
    ``cells``-cell pass under ``target`` cells per chunk (≤ ``cap``)."""
    n = 1
    while (n < cap and G % (2 * n) == 0 and cells / n > target):
        n *= 2
    return n


def grid_shape_for(lo, hi, a: float, points_per_a: float = 2.5,
                   support: int = None, y_multiple: int = 1):
    """(logical shape, padded FFT shape, h, support) for a box — the single
    source of truth shared by build_grid and host-side memory sizing
    (System._ewald_objects picks the splitting ``a`` so the 7 real spectra
    fit the HBM budget; an estimate drifting from the builder would OOM).

    ``y_multiple``: round the padded y dim up to this multiple — the
    slab-decomposed multi-device far field (ewald_sharded) transposes the
    y axis across n_devices and needs P1 % n_devices == 0."""
    h = a / points_per_a
    sigma = a / 4.0
    if support is None:
        # window truncated at ±6σ: the tail (≈e^{−18}) stays below the
        # deconvolution amplification at the grid Nyquist
        support = 2 * int(np.ceil(6.0 * sigma / h)) + 1
    margin = (support // 2 + 1) * h
    lo = np.asarray(lo, np.float64) - margin
    hi = np.asarray(hi, np.float64) + margin
    shape = tuple(int(np.ceil((hi[i] - lo[i]) / h)) + 1 for i in range(3))
    # extra padding makes room for a smooth per-dim taper of the tabulated
    # kernel over offsets no physical pair uses (see build_grid); padded
    # dims rounded to multiples of 4 so the chunked tabulation always has
    # power-of-2 slab factors
    taper_cells = 22
    padded = []
    for i, s in enumerate(shape):
        mult = 4 * (y_multiple if i == 1 else 1) // math.gcd(
            4, y_multiple if i == 1 else 1)
        p = _round_up_fft(2 * s + 2 * taper_cells)
        while p % mult:
            p = _round_up_fft(p + 1)
        padded.append(p)
    return shape, tuple(padded), h, support, lo


def spectra_bytes(lo, hi, a: float, points_per_a: float = 2.5,
                  support: int = None, itemsize: int = 4) -> int:
    """Device bytes the 7 stored real spectra will occupy for this box."""
    _, padded, _, _, _ = grid_shape_for(lo, hi, a, points_per_a, support)
    return 7 * padded[0] * padded[1] * (padded[2] // 2 + 1) * itemsize


def build_grid(lo: np.ndarray, hi: np.ndarray, a: float,
               points_per_a: float = 2.5, support: int = None,
               dtype=jnp.float32, y_multiple: int = 1) -> EwaldGrid:
    """Precompute the spectral far-field operator for a fixed box.

    The box [lo, hi] must contain all sources and targets (with the window
    half-width margin added here). One-time cost: tabulating S_far on the
    2×-padded grid and six rFFTs — done ON DEVICE (only 1-D auxiliaries are
    uploaded; the spectra themselves never cross the host↔device link).
    ``y_multiple``: see grid_shape_for (slab-decomposed multi-device FFT).
    """
    shape, padded, h, support, lo = grid_shape_for(lo, hi, a, points_per_a,
                                                   support,
                                                   y_multiple=y_multiple)
    sigma = a / 4.0

    axes = [np.fft.fftfreq(p, d=1.0 / p) * h for p in padded]  # signed offsets

    # Occupied cells span at most shape_i−1 per dim, so kernel values at
    # larger per-dim offsets multiply empty cells — the circular convolution
    # never reads them for valid geometry. Left untapered, the kernel's 1/r
    # tail is discontinuous across the periodic wrap seam, filling the
    # near-Nyquist modes with ~1e-5 content that the window deconvolution
    # then corrupts (the former accuracy floor). An erfc rolloff confined to
    # the unused range removes the seam while changing no physical pair.
    from scipy.special import erfc as _erfc
    w_t = 2.2 * h
    tapers = []
    for axis in range(3):
        off = axes[axis]
        lim = (shape[axis] - 1) * h
        tapers.append(0.5 * _erfc((np.abs(off) - lim - 5 * w_t) / w_t))

    # deconvolve the two spreading windows, evaluated on the k grid
    kx = 2 * np.pi * np.fft.fftfreq(padded[0], d=h)
    ky = 2 * np.pi * np.fft.fftfreq(padded[1], d=h)
    kz = 2 * np.pi * np.fft.rfftfreq(padded[2], d=h)

    # continuous FT of the ES window by quadrature (FINUFFT practice); the
    # window is sampled in CELL units, so transform against k·h
    beta = _es_beta(support)
    half = support / 2.0
    # substitute x = (W/2)·sinθ: φ dx = e^{β(cosθ−1)}·(W/2)cosθ dθ is smooth
    # (no sqrt endpoint singularity), so the trapezoid rule is spectrally
    # accurate — the 1e-5-class quadrature error of sampling φ(x) directly
    # shows up verbatim in the deconvolved far field
    th = np.linspace(-np.pi / 2, np.pi / 2, 2001)
    xq = half * np.sin(th)
    phiq = np.exp(beta * (np.cos(th) - 1.0)) * half * np.cos(th)
    dth = th[1] - th[0]

    def wk_1d(k):
        # ŵ(k) normalized to ŵ(0) = 1
        vals = (phiq[None, :] * np.cos(np.outer(k * h, xq))).sum(axis=1) * dth
        return vals / vals.max()

    # tabulate in f64 where the backend has it (CPU oracle runs), f32 on TPU
    comp = (jnp.float64 if (jax.config.jax_enable_x64
                            and jax.default_backend() == "cpu")
            else jnp.float32)
    one_d = [jnp.asarray(v, comp) for v in
             (axes[0], axes[1], axes[2], tapers[0], tapers[1], tapers[2],
              wk_1d(kx), wk_1d(ky), wk_1d(kz))]
    # chunk the per-component passes so transient FFT temps stay bounded
    # regardless of grid size (the 1M-point OOM class); small grids run
    # single-shot (n=m=1)
    cells = padded[0] * padded[1] * padded[2]
    Gzr = padded[2] // 2 + 1
    n_chunks = _pow2_chunks(padded[0], cells, 6e7)
    m_chunks = _pow2_chunks(padded[1], padded[0] * padded[1] * Gzr, 4e7)
    comps = _tabulate_all(float(a), *one_d, n_chunks=n_chunks,
                          m_chunks=m_chunks)
    khat = tuple(c.astype(dtype) for c in comps[:6])
    phihat = comps[6].astype(dtype)

    return EwaldGrid(lo=jnp.asarray(lo, dtype), h=float(h), shape=padded,
                     sigma=float(sigma), support=int(support),
                     khat=khat, a=float(a),
                     phihat=phihat, logical=shape)


def _es_beta(support: int) -> float:
    """Exponential-of-semicircle shape parameter.

    FINUFFT's β = 2.30·W/2 assumes a 2×-oversampled fine grid whose upper
    half-band is discarded. Here every padded-grid mode up to Nyquist is
    deconvolved, so β must keep ŵ's first zero beyond Nyquist:
    β ≈ 0.96·π·W/2 (the classic no-oversampling Kaiser–Bessel regime)."""
    return 0.96 * np.pi * (support / 2.0)


def _window_1d(frac: jax.Array, support: int, sigma_h: float, dtype):
    """Exponential-of-semicircle window φ(t) = e^{β(√(1−t²)−1)} at integer
    offsets −W/2..W/2 − frac (t scaled to [−1, 1] across the support).

    The ES window (the FINUFFT kernel) reaches spectral-class spreading
    accuracy at the same width where a Gaussian stalls near 1e-4.
    ``sigma_h`` is unused (kept for signature stability)."""
    del sigma_h
    beta = _es_beta(support)
    half = support / 2.0
    offs = jnp.arange(support, dtype=dtype) - (support // 2)
    t = (offs[None, :] - frac[:, None]) / half    # (N, W) in [−1, 1]
    inside = jnp.abs(t) < 1.0
    arg = jnp.sqrt(jnp.where(inside, 1.0 - t * t, 0.0))
    w = jnp.where(inside, jnp.exp(beta * (arg - 1.0)), 0.0)
    # per-point sum normalization ≈ dividing by ∫φ/h (the window is designed
    # so Σ_n φ(n−frac) is frac-independent to spectral accuracy); the
    # deconvolution uses ŵ(k)/ŵ(0) to match
    return w / jnp.sum(w, axis=1, keepdims=True)


def _es_phi(t, beta):
    """Raw ES window φ(t) = e^{β(√(1−t²)−1)} for |t| < 1, else 0."""
    inside = jnp.abs(t) < 1.0
    arg = jnp.sqrt(jnp.where(inside, 1.0 - t * t, 0.0))
    return jnp.where(inside, jnp.exp(beta * (arg - 1.0)), 0.0)


def _window_normalizer(frac, support, dtype, wide: bool = False):
    """Σ_n φ(n−frac) over the point's own W taps (the _window_1d divisor).

    ``wide`` widens the tap range by one on each side — needed when ``frac``
    is measured from a PREVIOUS step's slab center (plan reuse) and may sit
    in (−1, 1); for |frac| ≤ 1/2 the extra taps are exact zeros (φ has
    compact support), so wide and narrow agree on fresh builds."""
    beta = _es_beta(support)
    half = support / 2.0
    w = int(wide)
    offs = jnp.arange(support + 2 * w, dtype=dtype) - (support // 2 + w)
    return jnp.sum(_es_phi((offs[None, :] - frac[:, None]) / half, beta),
                   axis=1)


def _flat_window(points, lo, h, sigma, grid_shape, support, dtype):
    """Flat (N, W³) grid indices + combined window weights.

    The flattened layout keeps the trailing axis large (W³), which matters:
    (N, W, W, W) operands would be lane-padded W → 128 by TPU tiling.
    """
    rel = (points - lo[None, :]) / h
    # center the W taps on the NEAREST node: displacements stay in ±W/2, the
    # window's full support (floor-centering truncates one side for frac>1/2,
    # a 1e-4-class spreading error)
    base = jnp.floor(rel + 0.5).astype(jnp.int32)
    frac = rel - base.astype(dtype)
    sigma_h = sigma / h
    wx = _window_1d(frac[:, 0], support, sigma_h, dtype)
    wy = _window_1d(frac[:, 1], support, sigma_h, dtype)
    wz = _window_1d(frac[:, 2], support, sigma_h, dtype)
    offs = jnp.arange(support) - (support // 2)
    ix = (base[:, 0:1] + offs[None, :]) % grid_shape[0]
    iy = (base[:, 1:2] + offs[None, :]) % grid_shape[1]
    iz = (base[:, 2:3] + offs[None, :]) % grid_shape[2]
    W = support
    flat = ((ix[:, :, None, None] * grid_shape[1] + iy[:, None, :, None])
            * grid_shape[2] + iz[:, None, None, :]).reshape(-1, W * W * W)
    w3 = (wx[:, :, None, None] * wy[:, None, :, None]
          * wz[:, None, None, :]).reshape(-1, W * W * W)
    return flat, w3


def _bin_by_key(key, n_bins: int, cap: int, payloads):
    """Pad points into (n_bins, cap, …) bins WITHOUT scatters.

    Sort by key, locate each bin's slice with searchsorted, and GATHER the
    first ``cap`` entries per bin — sort/searchsorted/take only, so it runs
    on backends whose scatter lowering is missing (the axon TPU). Returns
    [(n_bins, cap, …) arrays], one per (payload, fill) pair; overflow beyond
    ``cap`` is dropped.
    """
    n = key.shape[0]
    order = jnp.argsort(key)
    key_s = key[order]
    bounds = jnp.searchsorted(key_s, jnp.arange(n_bins + 1, dtype=key.dtype))
    starts, ends = bounds[:-1], bounds[1:]
    slot = jnp.arange(cap, dtype=starts.dtype)
    idx = starts[:, None] + slot[None, :]            # (n_bins, cap)
    valid = idx < ends[:, None]
    idx_c = jnp.clip(idx, 0, n - 1)
    outs = []
    for pay, fill in payloads:
        g = pay[order][idx_c]                        # (n_bins, cap, …)
        mask = valid[(...,) + (None,) * (g.ndim - 2)]
        outs.append(jnp.where(mask, g, fill))
    return outs


@partial(jax.jit, static_argnames=("grid_shape", "support"))
def _spread_scatter(points, values, lo, h, sigma, grid_shape, support):
    """Scatter-add spreading (the textbook NUFFT formulation)."""
    dtype = values.dtype
    flat, w3 = _flat_window(points, lo, h, sigma, grid_shape, support, dtype)
    G = grid_shape[0] * grid_shape[1] * grid_shape[2]
    grids = []
    for c in range(values.shape[1]):
        gc = jnp.zeros(G, dtype).at[flat].add(w3 * values[:, c, None])
        grids.append(gc.reshape(grid_shape))
    return jnp.stack(grids)


def _slab_bins(points, h, lo, Gx, cap, CP, n_entries, dtype, support):
    """Scatter-free RAGGED x-slab binning shared by slab spread/interp.

    Points sort by their nearest x-plane; each slab's sorted run splits
    into chunks of CP slots, and the non-empty (slab, chunk) pairs compact
    into a flat entry list of static length ``n_entries`` — compute then
    scales with the number of occupied chunks, not with Gx × max-occupancy
    (occupancy skew made the rectangular layout multiply ~6× padding at
    oocyte scale). n_entries = ⌈N/CP⌉ + Gx is a TIGHT static bound (each
    slab wastes at most one partial chunk), so entry overflow cannot
    happen; only the per-slab ``cap`` can drop points (counted by
    slab_dropped, regrown by the System).

    Returns (E, CP) stores of rel_y, rel_z, fx plus the entry slab ids and
    the pieces of the gather-only inverse map. Empty slots carry rel=1e12,
    outside every window's support, so their φ values vanish identically.
    """
    n = points.shape[0]
    rel = (points - lo[None, :]) / h
    base_x = jnp.floor(rel[:, 0] + 0.5).astype(jnp.int32)
    fx = (rel[:, 0] - base_x.astype(dtype)).astype(dtype)
    frac = rel - jnp.floor(rel + 0.5)
    Z = (_window_normalizer(frac[:, 0].astype(dtype), support, dtype)
         * _window_normalizer(frac[:, 1].astype(dtype), support, dtype)
         * _window_normalizer(frac[:, 2].astype(dtype), support, dtype))
    key = jnp.clip(base_x, 0, Gx - 1)
    order = jnp.argsort(key)
    key_s = key[order]
    bounds = jnp.searchsorted(key_s, jnp.arange(Gx + 1, dtype=key.dtype))
    starts, ends = bounds[:-1], bounds[1:]
    occ = jnp.minimum(ends - starts, cap)
    nchunk = -(-occ // CP)                              # (Gx,), ≤ ⌈cap/CP⌉
    # prefix sums via a triangular matmul: cumsum/nonzero lower to
    # reduce-window prefix scans whose scoped-vmem stack overflows the TPU
    # compiler inside large fused programs; counts ≪ 2^24 are f32-exact
    tri = jnp.tril(jnp.ones((Gx, Gx), jnp.float32))
    cum_incl = (tri @ nchunk.astype(jnp.float32)).astype(jnp.int32)  # (Gx,)
    cum_chunks = cum_incl - nchunk                       # exclusive
    # entry e lives in the slab whose inclusive prefix first exceeds e
    e_idx = jnp.arange(n_entries, dtype=jnp.int32)
    ent_slab = jnp.searchsorted(cum_incl, e_idx, side="right").astype(
        jnp.int32)                                       # Gx ⇒ dummy entry
    slab_c = jnp.clip(ent_slab, 0, Gx - 1)
    ent_chunk = e_idx - cum_chunks[slab_c]
    idx = (starts[slab_c][:, None] + ent_chunk[:, None] * CP
           + jnp.arange(CP)[None, :])                   # (E, CP)
    slot_in = ent_chunk[:, None] * CP + jnp.arange(CP)[None, :]
    valid = ((ent_slab < Gx)[:, None] & (idx < ends[slab_c][:, None])
             & (slot_in < cap))
    idx_c = jnp.clip(idx, 0, n - 1)
    far = jnp.asarray(1e12, dtype)
    rel_y = jnp.where(valid, rel[:, 1].astype(dtype)[order][idx_c], far)
    rel_z = jnp.where(valid, rel[:, 2].astype(dtype)[order][idx_c], far)
    fx_b = jnp.where(valid, fx[order][idx_c], far)
    # inverse map: point p (rank q in slab key[p]) lives at entry
    # cum_chunks[key] + q//CP, slot q%CP
    return (rel_y, rel_z, fx_b, ent_slab, Z, valid, order, starts, key,
            idx_c, cum_chunks)


@partial(jax.jit, static_argnames=("Gx", "cap"))
def slab_dropped(points, lo, h, Gx: int, cap: int):
    """Number of points the x-slab binning would drop at capacity ``cap``.

    Positions-only and cheap; the System evaluates it once per step so slab
    overflow is surfaced (and capacities regrown) instead of silently
    deleting far-field contributions."""
    rel_x = (points[:, 0] - lo[0]) / h
    key = jnp.clip(jnp.floor(rel_x + 0.5).astype(jnp.int32), 0, Gx - 1)
    key_s = jnp.sort(key)
    bounds = jnp.searchsorted(key_s, jnp.arange(Gx + 1, dtype=key.dtype))
    counts = bounds[1:] - bounds[:-1]
    return jnp.sum(jnp.maximum(counts - cap, 0)).astype(jnp.int32)


def _slab_cap(n_points: int, Gx: int) -> int:
    """Per-x-slab point capacity: 8× the uniform mean, rounded to 128.
    Overflow beyond the cap drops the tail (as in the cell-list near field);
    8× headroom covers the clustering of fibers/surfaces in practice."""
    return max(128, -(-8 * n_points // max(Gx, 1) // 128) * 128)


def _slab_CP(cap: int, target: int = 512):
    """Entry slot width: ≤ ``target``, snug for sparse sources."""
    return min(cap, target)


def _slab_entry_bound(N: int, Gx: int, CP: int) -> int:
    """Static entry-list length: ⌈N/CP⌉ + Gx covers any occupancy pattern
    (each slab wastes at most one partial chunk)."""
    return -(-N // CP) + Gx


def make_slab_bins(points, lo, h, Gx, support, cap, n_points=None):
    """Positions-only slab binning, reusable across every apply of a step
    (the argsort/searchsorted machinery in _slab_bins costs tens of ms at
    1e5 points on TPU — rebuilt each GMRES iteration it was a measurable
    slice of the matvec)."""
    n = n_points if n_points is not None else points.shape[0]
    CP = _slab_CP(cap)
    E = _slab_entry_bound(n, Gx, CP)
    return _slab_bins(points, h, lo, Gx, cap, CP, E, points.dtype, support)


def refresh_slab_bins(bins, points, lo, h, support):
    """Refresh a previous step's slab binning with CURRENT positions: the
    slab membership/ordering stays (no sorts), the per-point coordinates
    (rel_y, rel_z, fx, Z) are recomputed fresh. A point may now sit up to
    one cell from its binned slab's center (caller enforces displacement
    < h/2 via the skin bound), so fx lands in (−1, 1) — consumers must run
    their x windows WIDE (spread/interp ``wide=True``), which covers every
    nonzero tap of the true window and is therefore exact, not an
    approximation."""
    (_, _, _, ent_slab, _, valid, order, starts, key, idx_c,
     cum_chunks) = bins
    dtype = points.dtype
    rel = (points - lo[None, :]) / h
    fx = (rel[:, 0] - key.astype(dtype)).astype(dtype)
    frac = rel - jnp.floor(rel + 0.5)
    Z = (_window_normalizer(fx, support, dtype, wide=True)
         * _window_normalizer(frac[:, 1].astype(dtype), support, dtype)
         * _window_normalizer(frac[:, 2].astype(dtype), support, dtype))
    far = jnp.asarray(1e12, dtype)
    rel_y = jnp.where(valid, rel[:, 1].astype(dtype)[order][idx_c], far)
    rel_z = jnp.where(valid, rel[:, 2].astype(dtype)[order][idx_c], far)
    fx_b = jnp.where(valid, fx[order][idx_c], far)
    return (rel_y, rel_z, fx_b, ent_slab, Z, valid, order, starts, key,
            idx_c, cum_chunks)


@partial(jax.jit, static_argnames=("logical", "support", "cap", "wide",
                                   "padded_out"))
def _spread_slab(points, values, lo, h, logical, support, cap=None,
                 bins=None, wide: bool = False, padded_out: bool = False):
    """Slab-matmul spreading — the MXU formulation of NUFFT type-1.

    Points bin by their nearest x-plane ("slab"); the non-empty CP-wide
    slab chunks compact into a ragged entry list (_slab_bins). The y/z
    windows are evaluated DENSELY over the occupied grid extent: φ vanishes
    outside its support, so the dense (CP, G) window matrix is
    automatically banded and needs no index arithmetic. The whole spread
    then factors into, per entry and per x-window offset d (W of them),
    one matmul

        plane = (Wy ⊙ φx_d·v)ᵀ · Wz           ((C·Gy × CP) @ (CP × Gz))

    accumulated into grid rows slab+d via one dynamic-slice add per entry —
    no scatter. Total cost ≈ W·(N + Gx·CP/2)·(C·Gy)·Gz/CP MACs in
    MXU-native shapes, independent of slab-occupancy skew.
    """
    dtype = values.dtype
    N, C = values.shape
    Gx, Gy, Gz = logical
    beta = _es_beta(support)
    half = support / 2.0
    # wide: ±1 extra x row — required (and exact) with refreshed bins whose
    # fx is measured from the previous step's slab center (see
    # refresh_slab_bins); pure zero-padding for fresh bins
    W2 = support // 2 + int(wide)
    Wn = 2 * W2 + 1
    cap = cap or _slab_cap(N, Gx)
    CP = _slab_CP(cap)
    E = _slab_entry_bound(N, Gx, CP)
    (rel_y, rel_z, fx_b, ent_slab, Z, valid, order, starts, key, idx_c,
     _cum) = (bins if bins is not None
              else _slab_bins(points, h, lo, Gx, cap, CP, E, dtype, support))
    val_b = jnp.where(valid[..., None],
                      (values / Z[:, None])[order][idx_c], 0.0)  # (E,CP,C)

    gy = jnp.arange(Gy, dtype=dtype)
    gz = jnp.arange(Gz, dtype=dtype)

    def entry_body(gridp, ent):
        ry, rz, fx, vb, slab = ent
        Wy = _es_phi((gy[None, :] - ry[:, None]) / half, beta)   # (CP, Gy)
        Wz = _es_phi((gz[None, :] - rz[:, None]) / half, beta)   # (CP, Gz)
        planes = []
        for d in range(-W2, W2 + 1):
            cx = _es_phi((d - fx) / half, beta)                  # (CP,)
            lhs = Wy[:, None, :] * (cx[:, None] * vb)[:, :, None]
            plane = jnp.einsum("pm,pk->mk", lhs.reshape(CP, C * Gy), Wz)
            planes.append(plane.reshape(C, Gy, Gz))
        block = jnp.stack(planes, axis=1)                 # (C, Wn, Gy, Gz)
        z = jnp.zeros((), slab.dtype)
        cur = jax.lax.dynamic_slice(gridp, (z, slab, z, z),
                                    (C, Wn, Gy, Gz))
        gridp = jax.lax.dynamic_update_slice(gridp, cur + block,
                                             (z, slab, z, z))
        return gridp, None

    # row s of the logical grid receives window rows [s, s+Wn) of the
    # padded buffer; the +1 tail row absorbs the all-zero dummy entries
    gridp = jnp.zeros((C, Gx + 2 * W2 + 1, Gy, Gz), dtype)
    gridp, _ = jax.lax.scan(entry_body, gridp,
                            (rel_y, rel_z, fx_b, val_b, ent_slab))
    if padded_out:
        # distributed x-slab path (ewald_sharded): the W2 halo rows on each
        # side carry contributions belonging to neighbour devices' x ranges
        # and are ppermute-exchanged by the caller; buffer row W2+s ↔
        # logical row s, last row is the zero dummy absorber
        return gridp
    return gridp[:, W2: W2 + Gx]


@partial(jax.jit, static_argnames=("support", "cap", "wide", "halo_in"))
def _interp_slab(grids, points, lo, h, support, cap=None, bins=None,
                 wide: bool = False, halo_in: bool = False):
    """Slab-matmul interpolation (NUFFT type-2) — transpose of
    ``_spread_slab``: per ragged entry, read grid rows [slab, slab+Wn)
    (one dynamic slice) and contract against the dense y/z windows as
    matmuls; points recover their values through a gather-only inverse
    map."""
    dtype = grids.dtype
    beta = _es_beta(support)
    half = support / 2.0
    W2 = support // 2 + int(wide)   # see _spread_slab: ±1 x row under reuse
    Wn = 2 * W2 + 1
    if halo_in:
        # distributed x-slab path (ewald_sharded): grids already carries the
        # W2 neighbour halo rows plus the +1 dummy row (same layout as gpad)
        C, Gxp, Gy, Gz = grids.shape
        Gx = Gxp - 2 * W2 - 1
        gpad = grids
    else:
        C, Gx, Gy, Gz = grids.shape
        gpad = jnp.pad(grids, ((0, 0), (W2, W2 + 1), (0, 0), (0, 0)))
    N = points.shape[0]
    cap = cap or _slab_cap(N, Gx)
    CP = _slab_CP(cap)
    E = _slab_entry_bound(N, Gx, CP)
    (rel_y, rel_z, fx_b, ent_slab, Z, valid, order, starts, key, idx_c,
     cum_chunks) = (bins if bins is not None
                    else _slab_bins(points, h, lo, Gx, cap, CP, E, dtype,
                                    support))

    gy = jnp.arange(Gy, dtype=dtype)
    gz = jnp.arange(Gz, dtype=dtype)

    def entry_body(_, ent):
        ry, rz, fx, slab = ent
        Wy = _es_phi((gy[None, :] - ry[:, None]) / half, beta)   # (CP, Gy)
        Wz = _es_phi((gz[None, :] - rz[:, None]) / half, beta)   # (CP, Gz)
        z = jnp.zeros((), slab.dtype)
        rows = jax.lax.dynamic_slice(gpad, (z, slab, z, z),
                                     (C, Wn, Gy, Gz))
        acc = jnp.zeros((CP, C), dtype)
        for d in range(Wn):
            A = jnp.einsum("pj,cjk->pck", Wy, rows[:, d])
            t = jnp.einsum("pck,pk->pc", A, Wz)
            cx = _es_phi((d - W2 - fx) / half, beta)
            acc = acc + cx[:, None] * t
        return _, acc

    _, out = jax.lax.scan(entry_body, None,
                          (rel_y, rel_z, fx_b, ent_slab))   # (E, CP, C)
    # inverse map: point p (sorted rank q in slab key[p]) lives at entry
    # cum_chunks[key]+q//CP, slot q%CP
    ranks = jnp.argsort(order)
    q = ranks - starts[key]
    ent = cum_chunks[key] + q // CP
    u = out[jnp.clip(ent, 0, out.shape[0] - 1), q % CP]
    u = jnp.where((q < cap)[:, None], u, 0.0)
    return u / Z[:, None]


@partial(jax.jit, static_argnames=("support",))
def _interp_gather(grids, points, lo, h, sigma, support):
    """Flat-gather interpolation (fast on CPU; element gathers crawl on TPU)."""
    dtype = grids.dtype
    grid_shape = grids.shape[1:]
    flat, w3 = _flat_window(points, lo, h, sigma, grid_shape, support, dtype)
    flat_grids = grids.reshape(3, -1)
    vals = flat_grids[:, flat]                      # (3, N, W³)
    return jnp.einsum("cnw,nw->nc", vals, w3)


def _pad_to(grids, shape):
    C, gx, gy, gz = grids.shape
    return jnp.pad(grids, ((0, 0), (0, shape[0] - gx),
                           (0, shape[1] - gy), (0, shape[2] - gz)))


def _pad1(g, shape):
    return jnp.pad(g, ((0, shape[0] - g.shape[0]),
                       (0, shape[1] - g.shape[1]),
                       (0, shape[2] - g.shape[2])))


def _rfftn_staged(g, shape, logical):
    """rfftn of a (..., L0, L1, L2) block zero-padded to `shape`, staged per
    axis so each 1-D FFT pass only transforms rows that are not identically
    zero: pad z → rfft z over L0·L1 rows (P0·P1 in the naive order — ~4×
    more), pad y → fft y over L0 planes, pad x → fft x full. Hockney padding
    makes the input ≥75% zeros; staging skips most of that work exactly.
    Leading batch axes pass through."""
    L0, L1, L2 = logical
    P0, P1, P2 = shape
    nb = g.ndim - 3
    bpad = ((0, 0),) * nb
    zh = jnp.fft.rfft(jnp.pad(g, bpad + ((0, 0), (0, 0), (0, P2 - L2))),
                      axis=nb + 2)
    yh = jnp.fft.fft(jnp.pad(zh, bpad + ((0, 0), (0, P1 - L1), (0, 0))),
                     axis=nb + 1)
    return jnp.fft.fft(jnp.pad(yh, bpad + ((0, P0 - L0), (0, 0), (0, 0))),
                       axis=nb)


def _irfftn_staged(uh, shape, logical):
    """Inverse of ``_rfftn_staged``: only the (L0, L1, L2) corner of the
    padded-grid inverse transform is wanted, so slice after each axis pass
    instead of transforming the full padded grid and slicing at the end.
    Leading batch axes pass through."""
    L0, L1, L2 = logical
    P0, P1, P2 = shape
    nb = uh.ndim - 3
    u = jnp.fft.ifft(uh, axis=nb)[..., :L0, :, :]
    u = jnp.fft.ifft(u, axis=nb + 1)[..., :L1, :]
    return jnp.fft.irfft(u, n=P2, axis=nb + 2)[..., :L2]


# padded-cell count above which the k-space convolves run one component at
# a time behind optimization barriers (half-grids are 0.3+ GB there; letting
# XLA co-schedule all component FFTs OOMed the 1M-point compile by 3 GB)
_SEQ_CONVOLVE_CELLS = 60_000_000


@partial(jax.jit, static_argnames=("shape", "logical"))
def _far_convolve_logical(g_log, khat_ri, shape, logical):
    """Stokeslet k-space convolve, channel-at-a-time.

    Memory-bounded variant for large grids: each force channel is padded
    and transformed separately (one ~0.5 GB FFT in flight instead of a
    (3, padded) batch), and each velocity channel is sliced back to the
    occupied extent right after its inverse transform. Batch-FFT peak
    memory was the step-killer at oocyte scale (3× 2.5 GB stage buffers).
    All transforms are staged per axis (``_rfftn_staged``) to skip the
    Hockney zero padding's dead rows; below ~2e7 padded cells the three
    channels batch into single FFT calls (the stage buffers stay < 0.5 GB),
    above that the channel loop bounds peak memory.
    """
    L0, L1, L2 = logical
    cells = int(np.prod(shape))

    def K(i):
        # real spectrum (see EwaldGrid.khat): real × complex products
        return khat_ri[i]

    rows = [(0, 1, 2), (1, 3, 4), (2, 4, 5)]
    if cells > _SEQ_CONVOLVE_CELLS:
        # ≥1e6-point grids: one force channel in flight at a time. XLA's
        # scheduler happily front-loads all three channel FFTs (each
        # half-grid is ~0.3-0.6 GB at these shapes) — the optimization
        # barrier after each channel pins the live set to the 3 output
        # accumulators + 1 channel transform (the 1M-run compile OOMed
        # by 3 GB without it, chip_logs r4b2)
        uhs = [jnp.zeros(0) for _ in range(3)]
        for c in range(3):
            fh_c = _rfftn_staged(g_log[c], shape, logical)
            for i in range(3):
                term = K(rows[i][c]) * fh_c
                uhs[i] = term if c == 0 else uhs[i] + term
            uhs = list(jax.lax.optimization_barrier(tuple(uhs)))
        return jnp.stack([_irfftn_staged(uh, shape, logical).astype(
            g_log.dtype) for uh in uhs])
    batch = cells <= 20_000_000
    if batch:
        fh3 = _rfftn_staged(g_log, shape, logical)
        fh = [fh3[c] for c in range(3)]
    else:
        fh = [_rfftn_staged(g_log[c], shape, logical) for c in range(3)]
    uhs = []
    for i in range(3):
        uhs.append(K(rows[i][0]) * fh[0] + K(rows[i][1]) * fh[1]
                   + K(rows[i][2]) * fh[2])
    if batch:
        return _irfftn_staged(jnp.stack(uhs), shape, logical).astype(
            g_log.dtype)
    return jnp.stack([_irfftn_staged(uh, shape, logical).astype(g_log.dtype)
                      for uh in uhs])


@partial(jax.jit, static_argnames=("shape", "logical", "h"))
def _far_stresslet_convolve_logical(D_log, khat_ri, phihat_ri, shape,
                                    logical, h):
    """Stresslet k-space convolve, channel-at-a-time (see
    ``_far_convolve_logical``; math per ``_far_stresslet_convolve``).
    The six dipole spectra are never co-resident: each one accumulates
    into (M̂x, M̂y, M̂z, tr D̂) and is discarded."""
    L0, L1, L2 = logical
    rdt = D_log.dtype
    kx = jnp.asarray(2 * np.pi * np.fft.fftfreq(shape[0], d=h), rdt)[:, None, None]
    ky = jnp.asarray(2 * np.pi * np.fft.fftfreq(shape[1], d=h), rdt)[None, :, None]
    kz = jnp.asarray(2 * np.pi * np.fft.rfftfreq(shape[2], d=h), rdt)[None, None, :]
    kvec = (kx, ky, kz)
    # channel c ↔ (i, j) of the symmetric dipole; off-diagonals appear in
    # two M components, diagonals in one plus the trace
    comp = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]

    def K(i):
        return khat_ri[i]   # real spectrum (see EwaldGrid.khat)

    phihat = phihat_ri
    sym = {(0, 0): 0, (0, 1): 1, (0, 2): 2, (1, 1): 3, (1, 2): 4, (2, 2): 5}
    rows = [(0, 1, 2), (1, 3, 4), (2, 4, 5)]
    if int(np.prod(shape)) > _SEQ_CONVOLVE_CELLS:
        # ≥1e6-point grids: expand uh_a = 2·Σ_b K(a,b)·M_b + k_a·φ̂·trD per
        # dipole component and accumulate the 3 OUTPUT spectra directly —
        # the same sum reordered — so only one D̂_c is ever in flight. The
        # optimization barrier stops XLA from co-scheduling the six
        # component FFTs (the M-accumulator form kept ~17 half-grid temps
        # alive and OOMed the 1M-point compile by 3 GB, chip_logs r4b2).
        uhs = [jnp.zeros(0) for _ in range(3)]
        for c, (i, j) in enumerate(comp):
            Dh = _rfftn_staged(D_log[c], shape, logical)
            for a in range(3):
                term = 2.0 * K(sym[tuple(sorted((a, i)))]) * (kvec[j] * Dh)
                if i != j:
                    term = term + 2.0 * K(sym[tuple(sorted((a, j)))]) * (
                        kvec[i] * Dh)
                else:
                    term = term + kvec[a] * phihat * Dh
                uhs[a] = term if c == 0 else uhs[a] + term
            uhs = list(jax.lax.optimization_barrier(tuple(uhs)))
        return jnp.stack([
            _irfftn_staged(1j * uh, shape, logical).astype(rdt)
            for uh in uhs])
    M = [0.0, 0.0, 0.0]
    trD = 0.0
    for c, (i, j) in enumerate(comp):
        Dh = _rfftn_staged(D_log[c], shape, logical)
        M[i] = M[i] + kvec[j] * Dh
        if i != j:
            M[j] = M[j] + kvec[i] * Dh
        else:
            trD = trD + Dh

    out = []
    for i in range(3):
        uh = 2.0 * (K(rows[i][0]) * M[0] + K(rows[i][1]) * M[1]
                    + K(rows[i][2]) * M[2]) + kvec[i] * phihat * trD
        ui = _irfftn_staged(1j * uh, shape, logical)
        out.append(ui.astype(rdt))
    return jnp.stack(out)


@jax.jit
def _far_convolve(grids, khat_ri):
    khat = khat_ri   # 6 real spectra (see EwaldGrid.khat)
    fhat = jnp.fft.rfftn(grids, axes=(1, 2, 3))
    ux = khat[0] * fhat[0] + khat[1] * fhat[1] + khat[2] * fhat[2]
    uy = khat[1] * fhat[0] + khat[3] * fhat[1] + khat[4] * fhat[2]
    uz = khat[2] * fhat[0] + khat[4] * fhat[1] + khat[5] * fhat[2]
    u = jnp.stack([ux, uy, uz])
    return jnp.fft.irfftn(u, s=grids.shape[1:], axes=(1, 2, 3)).astype(grids.dtype)


def _use_slab() -> bool:
    """Scatter-add/flat-gather on CPU (fast there); slab-matmul spread and
    interp on accelerators — the axon TPU backend lacks large scatters, and
    per-element gathers crawl, while batched banded-window matmuls are
    MXU-native. SKELLY_SLAB=1/0 overrides (tests exercise the slab path —
    the only one supporting far-plan reuse — on the CPU suite)."""
    env = os.environ.get("SKELLY_SLAB")
    if env is not None:
        return env != "0"
    return jax.default_backend() != "cpu"


def far_field_apply(grid: EwaldGrid, r_src, f_src, r_trg, slab_cap=None,
                    bins_src=None, bins_trg=None, wide: bool = False):
    if _use_slab():
        L = tuple(grid.logical)
        glog = _spread_slab(r_src, f_src, grid.lo, grid.h, L, grid.support,
                            cap=slab_cap, bins=bins_src, wide=wide)
        u_log = _far_convolve_logical(glog, grid.khat, grid.shape, L)
        return _interp_slab(u_log, r_trg, grid.lo, grid.h, grid.support,
                            cap=slab_cap, bins=bins_trg, wide=wide)
    grids = _spread_scatter(r_src, f_src, grid.lo, grid.h, grid.sigma,
                            grid.shape, grid.support)
    u_grids = _far_convolve(grids, grid.khat)
    # the tabulated kernel carries the h³ quadrature of the convolution
    return _interp_gather(u_grids, r_trg, grid.lo, grid.h, grid.sigma,
                          grid.support)


@partial(jax.jit, static_argnames=("shape", "support", "h"))
def _far_stresslet_convolve(D_grids, khat_ri, phihat_ri, shape, support, h):
    """Far stresslet via the k-space derivative identity.

    With D̂ the 6 symmetric dipole-strength grids (xx,xy,xz,yy,yz,zz) and
    Ŝ the deconvolved stokeslet tabulation,
        û_i = i·[ 2 Σ_j Ŝ_ij M̂_j + k_i φ̂ tr(D̂) ],   M̂_j = Σ_k k_k D̂_jk,
    which is the transform of T_ijk D_jk = (∂_k S_ij + ∂_j S_ik − δ_jk P_i)
    D_jk. Spectral derivatives of the seam-tapered tabulation are exact to
    its (Gaussian-small) aliasing level.
    """
    khat = khat_ri       # 6 real spectra (see EwaldGrid.khat)
    phihat = phihat_ri   # real
    Dh = jnp.fft.rfftn(D_grids, axes=(1, 2, 3))
    rdt = D_grids.dtype
    kx = jnp.asarray(2 * np.pi * np.fft.fftfreq(shape[0], d=h), rdt)[:, None, None]
    ky = jnp.asarray(2 * np.pi * np.fft.fftfreq(shape[1], d=h), rdt)[None, :, None]
    kz = jnp.asarray(2 * np.pi * np.fft.rfftfreq(shape[2], d=h), rdt)[None, None, :]
    Dxx, Dxy, Dxz, Dyy, Dyz, Dzz = Dh
    Mx = kx * Dxx + ky * Dxy + kz * Dxz
    My = kx * Dxy + ky * Dyy + kz * Dyz
    Mz = kx * Dxz + ky * Dyz + kz * Dzz
    trD = Dxx + Dyy + Dzz
    ux = 2.0 * (khat[0] * Mx + khat[1] * My + khat[2] * Mz) + kx * phihat * trD
    uy = 2.0 * (khat[1] * Mx + khat[3] * My + khat[4] * Mz) + ky * phihat * trD
    uz = 2.0 * (khat[2] * Mx + khat[4] * My + khat[5] * Mz) + kz * phihat * trD
    u = 1j * jnp.stack([ux, uy, uz])
    return jnp.fft.irfftn(u, s=shape, axes=(1, 2, 3)).astype(D_grids.dtype)


def far_field_apply_sharded(grid: EwaldGrid, r_src, f_src, r_trg, mesh,
                            slab_cap=None, convolve: str = "stokeslet"):
    """Multi-device far field: points sharded, grid psum, replicated
    convolve, targets sharded.

    The distribution mirrors where the time goes (profiled: point-side
    spread/interp dominates, the FFT convolve is ~10-15%): each device
    spreads ITS point shard into a full logical grid, one psum assembles the
    density grid, the k-space convolve is computed redundantly on every
    device (same wall-clock as one chip — no Amdahl loss beyond the psum),
    and each device interpolates only its target shard. This is the TPU
    analogue of the reference's MPI-distributed FMM far field
    (include/kernels.hpp:56-134): sources rank-local, one collective, every
    rank reads the global far field.
    """
    import numpy as _np
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    nd = int(_np.prod(list(mesh.shape.values())))
    Ns, Nt = r_src.shape[0], r_trg.shape[0]
    ps, pt = (-Ns) % nd, (-Nt) % nd
    # zero-payload padding: padded points land in a real slab but carry no
    # density; padded targets produce values that are sliced away
    rs = jnp.pad(r_src, ((0, ps), (0, 0)))
    fs_ = jnp.pad(f_src, ((0, ps), (0, 0)))
    rt = jnp.pad(r_trg, ((0, pt), (0, 0)))
    L = tuple(grid.logical)

    def body(rs_l, fs_l, rt_l, khat, phihat, lo):
        g = _spread_slab(rs_l, fs_l, lo, grid.h, L, grid.support,
                         cap=slab_cap)
        g = jax.lax.psum(g, axis)
        if convolve == "stokeslet":
            u = _far_convolve_logical(g, khat, grid.shape, L)
        else:
            u = _far_stresslet_convolve_logical(g, khat, phihat, grid.shape,
                                                L, grid.h)
        return _interp_slab(u, rt_l, lo, grid.h, grid.support, cap=slab_cap)

    u = shard_map(body, mesh=mesh,
                  in_specs=(P(axis), P(axis), P(axis), P(), P(), P()),
                  out_specs=P(axis), check_vma=False)(
        rs, fs_, rt, grid.khat, grid.phihat, grid.lo)
    return u[:Nt]


def far_stresslet_apply(grid: EwaldGrid, r_src, S, r_trg, slab_cap=None,
                        bins_src=None, bins_trg=None, wide: bool = False):
    """Grid far field of the stresslet with densities S (N,3,3); only the
    symmetric part couples (T is symmetric in its density indices)."""
    D = jnp.stack([S[:, 0, 0],
                   0.5 * (S[:, 0, 1] + S[:, 1, 0]),
                   0.5 * (S[:, 0, 2] + S[:, 2, 0]),
                   S[:, 1, 1],
                   0.5 * (S[:, 1, 2] + S[:, 2, 1]),
                   S[:, 2, 2]], axis=1)
    if _use_slab():
        L = tuple(grid.logical)
        D_log = _spread_slab(r_src, D, grid.lo, grid.h, L, grid.support,
                             cap=slab_cap, bins=bins_src, wide=wide)
        u_log = _far_stresslet_convolve_logical(D_log, grid.khat,
                                                grid.phihat, grid.shape,
                                                L, grid.h)
        return _interp_slab(u_log, r_trg, grid.lo, grid.h, grid.support,
                            cap=slab_cap, bins=bins_trg, wide=wide)
    D_grids = _spread_scatter(r_src, D, grid.lo, grid.h, grid.sigma,
                              grid.shape, grid.support)
    u_grids = _far_stresslet_convolve(D_grids, grid.khat, grid.phihat,
                                      grid.shape, grid.support, grid.h)
    return _interp_gather(u_grids, r_trg, grid.lo, grid.h, grid.sigma,
                          grid.support)


# ---- near field: cell lists ----

@partial(jax.jit, static_argnames=("n_cells_xyz", "cap", "a", "kernel"))
def _near_apply(r_src, f_src, r_trg, lo, cell_size, n_cells_xyz, cap, a,
                kernel="stokeslet"):
    """Cell-list screened pairwise sum.

    Sources bin into cells of size ≥ r_cut with fixed per-cell capacity
    (overflow contributes from the dropped tail — callers size `cap` from the
    true max occupancy). Each target gathers its 27 neighbor cells.

    ``kernel``: "stokeslet" (payload (N,3) forces) or "stresslet"
    (payload (N,6) = [normal | q], 8π/η-free scale).
    """
    dtype = r_trg.dtype
    nx, ny, nz = n_cells_xyz
    n_cells = nx * ny * nz
    ci = jnp.clip(((r_src - lo[None, :]) / cell_size).astype(jnp.int32),
                  0, jnp.asarray([nx - 1, ny - 1, nz - 1]))
    key = (ci[:, 0] * ny + ci[:, 1]) * nz + ci[:, 2]
    # padded per-cell stores, built scatter-free
    cell_r, cell_f = _bin_by_key(key, n_cells, cap,
                                 [(r_src, jnp.asarray(1e15, dtype)),
                                  (f_src, jnp.asarray(0.0, dtype))])

    # neighbor table (27 per cell), clipped at the box faces
    cx = jnp.arange(nx)
    cy = jnp.arange(ny)
    cz = jnp.arange(nz)

    tci = jnp.clip(((r_trg - lo[None, :]) / cell_size).astype(jnp.int32),
                   0, jnp.asarray([nx - 1, ny - 1, nz - 1]))

    def one_target_chunk(rt_chunk_and_ci):
        rt, tci_c = rt_chunk_and_ci
        u = jnp.zeros_like(rt)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    ni = jnp.clip(tci_c[:, 0] + dx, 0, nx - 1)
                    nj = jnp.clip(tci_c[:, 1] + dy, 0, ny - 1)
                    nk = jnp.clip(tci_c[:, 2] + dz, 0, nz - 1)
                    # avoid double counting clipped duplicates
                    valid = ((tci_c[:, 0] + dx == ni) & (tci_c[:, 1] + dy == nj)
                             & (tci_c[:, 2] + dz == nk))
                    nkey = (ni * ny + nj) * nz + nk
                    rs = cell_r[nkey]            # (T, cap, 3)
                    fs = cell_f[nkey]
                    d = rt[:, None, :] - rs
                    r2 = jnp.sum(d * d, axis=-1)
                    live = (r2 < 1e28) & valid[:, None]
                    if kernel == "stokeslet":
                        fN, gN = near_coeffs(r2, a)
                        # coincident pairs: the far grid contributed
                        # f_far(0)·f; cancel it here so the total matches the
                        # dense evaluator's r=0 exclusion for ANY layout
                        f0 = 1.0 / (2.0 * math.pi**1.5 * a)
                        fN = jnp.where(live, jnp.where(r2 > 0, fN, -f0), 0.0)
                        gN = jnp.where(live, gN, 0.0)
                        df = jnp.sum(d * fs, axis=-1)
                        r2safe = jnp.where(r2 > 0, r2, 1.0)
                        u = u + jnp.sum(fN[:, :, None] * fs
                                        + (gN * df / r2safe)[:, :, None] * d,
                                        axis=1)
                    else:
                        Sm = fs.reshape(fs.shape[0], fs.shape[1], 3, 3)
                        A_r, B_r, C_r3 = stresslet_near_coeffs(r2, a)
                        A_r = jnp.where(live, A_r, 0.0)
                        B_r = jnp.where(live, B_r, 0.0)
                        C_r3 = jnp.where(live, C_r3, 0.0)
                        tr = jnp.trace(Sm, axis1=-2, axis2=-1)
                        Sd = jnp.einsum("tcij,tcj->tci", Sm, d)
                        Std = jnp.einsum("tcji,tcj->tci", Sm, d)
                        dSd = jnp.sum(d * Sd, axis=-1)
                        u = u + jnp.sum((A_r * tr)[:, :, None] * d
                                        + B_r[:, :, None] * (Sd + Std)
                                        + (C_r3 * dSd)[:, :, None] * d,
                                        axis=1)
        return u

    CH = 4096
    T = r_trg.shape[0]
    pad = (-T) % CH
    rt_p = jnp.pad(r_trg, ((0, pad), (0, 0)))
    ci_p = jnp.pad(tci, ((0, pad), (0, 0)))
    u = jax.lax.map(one_target_chunk,
                    (rt_p.reshape(-1, CH, 3), ci_p.reshape(-1, CH, 3)))
    return u.reshape(-1, 3)[:T]


class EwaldStokeslet:
    """Stokeslet evaluator with spectral far field + cell-list near field.

    Built once for a bounding box and splitting width `a`; then
    ``apply(r_src, f_src, r_trg, eta)`` is a drop-in for the dense
    evaluators. Defaults balance near/far work at the ~1e-4 accuracy class
    (PME balance): r_cut = 3.5a truncates erfc at ~5e-6, grid h = a/2.5
    keeps the screened spectrum ~5e-5 at Nyquist. Choose a ≈ 1-2× the mean
    point spacing; `cap` bounds points per r_cut-sized cell.
    """

    def __init__(self, lo, hi, a: float, points_per_a: float = 2.5,
                 support: int = None, cut_in_a: float = 3.5, cap: int = 192,
                 dtype=jnp.float32, grid: EwaldGrid = None,
                 slab_cap: int = None, cap_t: int = None,
                 pair_total: int = 65536, near_mxu: bool = False,
                 near_poly: bool = False, y_multiple: int = 1):
        self.grid = (grid if grid is not None
                     else build_grid(lo, hi, a, points_per_a, support, dtype,
                                     y_multiple=y_multiple))
        self.a = float(a)
        self.r_cut = cut_in_a * a
        # near-field output contractions on the MXU (A/B knob; stokeslet
        # kernel only — see ewald_near_cluster._stokeslet_block_mxu)
        self.near_mxu = bool(near_mxu)
        # FMA-only polynomial screened coefficients (A/B knob; replaces the
        # per-pair exp/erfc/divide — ewald_near_cluster._screened_polys)
        self.near_poly = bool(near_poly)
        # the box the grid covers: points OUTSIDE it spread/interp with
        # clamped or vanishing windows — silently wrong physics. Callers
        # (System) count escapes per step and rebuild on a fresh box.
        self.box_lo = np.asarray(lo, np.float64)
        self.box_hi = np.asarray(hi, np.float64)
        # legacy cell-list capacity (the `_near_apply` reference path) and
        # far-field x-slab capacity: both drop overflow points — size from
        # geometry when known (System._ewald_objects); overflow is COUNTED
        # (ClusterPlan.dropped, slab_dropped) so callers can regrow
        self.cap = int(cap)
        self.cap_t = int(cap_t) if cap_t is not None else int(cap)
        self.slab_cap = slab_cap
        # COO cluster-pairlist capacity (production near field): total
        # candidate cluster pairs across all targets
        self.pair_total = int(pair_total)
        self.lo = np.asarray(lo, np.float64) - 2 * self.r_cut
        hi = np.asarray(hi, np.float64) + 2 * self.r_cut
        self.cell = self.r_cut
        self.n_cells = tuple(max(1, int(np.ceil((hi[i] - self.lo[i]) / self.cell)))
                             for i in range(3))
        self.dtype = dtype
        # optional jax.sharding.Mesh: when set, the far field runs
        # points-sharded + grid-psum and the near field shards the pairlist
        # chunks (far_field_apply_sharded / near_apply_plan_sharded)
        self.mesh = None

    def spectra(self):
        """The large device buffers, as a pytree for threading through an
        outer jit as ARGUMENTS. Closing over them instead embeds tens of MB
        of constants in the HLO — remote compile services reject the payload
        (HTTP 413 on the tunneled TPU) and every backend bloats."""
        return {"khat": self.grid.khat, "phihat": self.grid.phihat}

    def make_near_plan(self, r_src, r_trg, skin: float = 0.0):
        """Positions-only cluster pairlist (ClusterPlan). Positions are
        fixed for a whole timestep, so the System builds this once per step
        and shares it across every GMRES iteration; ``plan.dropped`` counts
        pairlist overflow. A nonzero ``skin`` widens the candidate test so
        the plan survives across steps (see refresh_plans)."""
        from skellysim_tpu.kernels.ewald_near_cluster import make_plan

        dt = self.dtype
        return make_plan(r_src.astype(dt), r_trg.astype(dt),
                         jnp.asarray(self.lo, dt), self.r_cut,
                         self.pair_total, skin=float(skin))

    def make_far_plan(self, r_src, r_trg):
        """Positions-only slab binnings (sources for spread, targets for
        interp), reusable across every apply of a timestep — the binning's
        argsort/searchsorted is tens of ms at 1e5 points on TPU and was
        being rebuilt inside every GMRES matvec. On a mesh with a
        slab-decomposable grid this is the per-device sharded plan
        (selection + local bins, ewald_sharded.make_far_plan_sharded);
        None on the non-slab (CPU) path, which bins internally."""
        dt = self.dtype
        if self.mesh is not None:
            from skellysim_tpu.kernels.ewald_sharded import (
                make_far_plan_sharded, slab_grid_ok)

            nd = int(np.prod(list(self.mesh.shape.values())))
            if not slab_grid_ok(self.grid, nd):
                return None
            return make_far_plan_sharded(
                self.grid, self.mesh, r_src.astype(dt), r_trg.astype(dt),
                slab_cap=self.slab_cap,
                select_mult=getattr(self, "far_select_mult", 3))
        if not _use_slab():
            return None
        g = self.grid
        Gx = int(g.logical[0])
        cap = self.slab_cap or _slab_cap(r_src.shape[0], Gx)
        return (make_slab_bins(r_src.astype(dt), g.lo, g.h, Gx, g.support,
                               cap),
                make_slab_bins(r_trg.astype(dt), g.lo, g.h, Gx, g.support,
                               cap))

    def refresh_near(self, plan, r_src, r_trg):
        """Verlet-list reuse of the NEAR plan: rebind a previous step's
        cluster pairlist to CURRENT positions with gathers only (no sorts).
        Valid while every point has moved < skin/2 since the plan's build:
        the candidate list then still covers every pair within r_cut, and
        the result matches a fresh skin-plan up to the shared real-space
        truncation tail (the two candidate sets may differ by pairs in the
        [r_cut, r_cut+skin] shell, each contributing its true, erfc-tail-
        sized screened term — ~1e-7 relative at cut_in_a=3.5, below the
        evaluator class)."""
        from skellysim_tpu.kernels.ewald_near_cluster import refresh_stores

        dt = self.dtype
        return refresh_stores(plan, r_src.astype(dt), r_trg.astype(dt))

    def refresh_far(self, far_plan, r_src, r_trg):
        """Reuse of the FAR slab binnings: recompute per-point coordinates
        through the previous build's slab membership. Exact while every
        point has moved < h/2 since the far plan's build, PROVIDED consuming
        applies pass wide=True (the ±1-extra-row x windows then cover every
        nonzero tap — see refresh_slab_bins)."""
        if far_plan is None:
            return None
        if self.mesh is not None:
            # sharded plans rebuild instead of refreshing: a moved point
            # can cross a slab-ownership boundary, which no gather-only
            # refresh can follow (the structure matches, so this slots
            # into the same lax.cond branch)
            return self.make_far_plan(r_src, r_trg)
        g = self.grid
        dt = self.dtype
        return (refresh_slab_bins(far_plan[0], r_src.astype(dt),
                                  g.lo, g.h, g.support),
                refresh_slab_bins(far_plan[1], r_trg.astype(dt),
                                  g.lo, g.h, g.support))

    def refresh_plans(self, plan, far_plan, r_src, r_trg):
        """refresh_near + refresh_far in one call (same displacement bounds:
        the caller enforces min(skin/2, h/2) and runs the far windows
        wide). Matches a full rebuild up to the shared real-space
        truncation tail, not bitwise (see refresh_near)."""
        return (self.refresh_near(plan, r_src, r_trg),
                self.refresh_far(far_plan, r_src, r_trg))

    def apply_with(self, spectra, r_src, f_src, r_trg, eta=1.0, plan=None,
                   far_plan=None, wide: bool = False):
        """``apply`` with the spectra passed explicitly (see ``spectra``).
        ``wide`` (static) runs the far-field x windows one row wider —
        required with refreshed far bins, exact (zero-padding) with fresh
        ones."""
        from skellysim_tpu.kernels.ewald_near_cluster import near_apply_plan

        from skellysim_tpu.kernels.ewald_near_cluster import (
            near_apply_plan_sharded)

        dt = self.dtype
        grid = self.grid._replace(khat=spectra["khat"],
                                  phihat=spectra["phihat"])
        if plan is None:
            plan = self.make_near_plan(r_src, r_trg)
        if self.mesh is not None:
            from skellysim_tpu.kernels.ewald_sharded import (
                far_field_apply_slabbed, slab_grid_ok)

            nd = int(np.prod(list(self.mesh.shape.values())))
            if slab_grid_ok(grid, nd):
                # genuinely distributed tier: x-slab grid + y-slab spectra,
                # O(grid/nd) per device (ewald_sharded module docstring).
                # far_plan (make_far_plan sharded form) skips the per-apply
                # selection/binning sorts; sharded plans are always fresh
                # (refresh_far rebuilds) so `wide` never applies here.
                u_far = far_field_apply_slabbed(
                    grid, r_src.astype(dt), f_src.astype(dt),
                    r_trg.astype(dt), self.mesh, slab_cap=self.slab_cap,
                    plan=far_plan,
                    select_mult=getattr(self, "far_select_mult", 3))
            else:
                u_far = far_field_apply_sharded(
                    grid, r_src.astype(dt), f_src.astype(dt),
                    r_trg.astype(dt), self.mesh, slab_cap=self.slab_cap)
            u_near = near_apply_plan_sharded(
                plan, f_src.astype(dt), self.a, self.mesh, kind="stokeslet",
                mxu=self.near_mxu,
                poly_cut=self.r_cut if self.near_poly else None)
        else:
            bins_src, bins_trg = far_plan if far_plan is not None \
                else (None, None)
            u_far = far_field_apply(grid, r_src.astype(dt), f_src.astype(dt),
                                    r_trg.astype(dt), slab_cap=self.slab_cap,
                                    bins_src=bins_src, bins_trg=bins_trg,
                                    wide=wide)
            u_near = near_apply_plan(
                plan, f_src.astype(dt), self.a, kind="stokeslet",
                mxu=self.near_mxu,
                poly_cut=self.r_cut if self.near_poly else None)
        return ((u_far + u_near) / eta).astype(r_trg.dtype)

    def apply(self, r_src, f_src, r_trg, eta=1.0, n_self: int = 0):
        """Velocity at targets; coincident pairs contribute zero
        (dense-evaluator semantics — the near-field pass cancels the grid's
        S_far(0) self term for any source/target layout). ``n_self`` is
        accepted for backward compatibility and ignored.
        """
        del n_self
        return self.apply_with(self.spectra(), r_src, f_src, r_trg, eta)


class EwaldStresslet:
    """Stresslet (double-layer) evaluator: spectral far + cell-list near.

    Drop-in for the dense ``stresslet_apply`` with S = n⊗q densities —
    the shell/body double-layer sums at scales beyond the dense tier
    (the reference applies these through its FMM, STKFMM PVel kernels).
    T_far(0) = 0, so unlike the stokeslet there is no grid self term to
    subtract.
    """

    def __init__(self, lo, hi, a: float, points_per_a: float = 2.5,
                 support: int = None, cut_in_a: float = 3.5, cap: int = 192,
                 dtype=jnp.float32, grid: EwaldGrid = None,
                 slab_cap: int = None, cap_t: int = None,
                 pair_total: int = 65536, near_mxu: bool = False,
                 near_poly: bool = False, y_multiple: int = 1):
        # near_mxu: accepted for ctor-kw symmetry with EwaldStokeslet; the
        # MXU output-contraction variant exists for the stokeslet only
        del near_mxu
        self.near_poly = bool(near_poly)
        self.grid = (grid if grid is not None
                     else build_grid(lo, hi, a, points_per_a, support, dtype,
                                     y_multiple=y_multiple))
        self.a = float(a)
        self.r_cut = cut_in_a * a
        # the box the grid covers: points OUTSIDE it spread/interp with
        # clamped or vanishing windows — silently wrong physics. Callers
        # (System) count escapes per step and rebuild on a fresh box.
        self.box_lo = np.asarray(lo, np.float64)
        self.box_hi = np.asarray(hi, np.float64)
        # legacy cell-list capacity (the `_near_apply` reference path) and
        # far-field x-slab capacity — see EwaldStokeslet
        self.cap = int(cap)
        self.cap_t = int(cap_t) if cap_t is not None else int(cap)
        self.slab_cap = slab_cap
        self.pair_total = int(pair_total)
        self.lo = np.asarray(lo, np.float64) - 2 * self.r_cut
        hi = np.asarray(hi, np.float64) + 2 * self.r_cut
        self.cell = self.r_cut
        self.n_cells = tuple(max(1, int(np.ceil((hi[i] - self.lo[i]) / self.cell)))
                             for i in range(3))
        self.dtype = dtype
        # optional jax.sharding.Mesh: when set, the far field runs
        # points-sharded + grid-psum and the near field shards the pairlist
        # chunks (far_field_apply_sharded / near_apply_plan_sharded)
        self.mesh = None

    def spectra(self):
        """See ``EwaldStokeslet.spectra``."""
        return {"khat": self.grid.khat, "phihat": self.grid.phihat}

    def make_near_plan(self, r_src, r_trg, skin: float = 0.0):
        """See ``EwaldStokeslet.make_near_plan``."""
        from skellysim_tpu.kernels.ewald_near_cluster import make_plan

        dt = self.dtype
        return make_plan(r_src.astype(dt), r_trg.astype(dt),
                         jnp.asarray(self.lo, dt), self.r_cut,
                         self.pair_total, skin=float(skin))

    make_far_plan = EwaldStokeslet.make_far_plan
    refresh_near = EwaldStokeslet.refresh_near
    refresh_far = EwaldStokeslet.refresh_far
    refresh_plans = EwaldStokeslet.refresh_plans

    def apply_with(self, spectra, r_src, S, r_trg, eta=1.0, plan=None,
                   far_plan=None, wide: bool = False):
        """``apply`` with the spectra passed explicitly (see ``spectra``);
        ``wide`` as in ``EwaldStokeslet.apply_with``."""
        from skellysim_tpu.kernels.ewald_near_cluster import near_apply_plan

        from skellysim_tpu.kernels.ewald_near_cluster import (
            near_apply_plan_sharded)

        dt = self.dtype
        grid = self.grid._replace(khat=spectra["khat"],
                                  phihat=spectra["phihat"])
        payload = S.reshape(S.shape[0], 9).astype(dt)
        if plan is None:
            plan = self.make_near_plan(r_src, r_trg)
        if self.mesh is not None:
            Ssym = S.astype(dt)
            D = jnp.stack([Ssym[:, 0, 0],
                           0.5 * (Ssym[:, 0, 1] + Ssym[:, 1, 0]),
                           0.5 * (Ssym[:, 0, 2] + Ssym[:, 2, 0]),
                           Ssym[:, 1, 1],
                           0.5 * (Ssym[:, 1, 2] + Ssym[:, 2, 1]),
                           Ssym[:, 2, 2]], axis=1)
            from skellysim_tpu.kernels.ewald_sharded import (
                far_field_apply_slabbed, slab_grid_ok)

            nd = int(np.prod(list(self.mesh.shape.values())))
            if slab_grid_ok(grid, nd):
                u_far = far_field_apply_slabbed(
                    grid, r_src.astype(dt), D, r_trg.astype(dt), self.mesh,
                    slab_cap=self.slab_cap, convolve="stresslet",
                    plan=far_plan,
                    select_mult=getattr(self, "far_select_mult", 3))
            else:
                u_far = far_field_apply_sharded(
                    grid, r_src.astype(dt), D, r_trg.astype(dt), self.mesh,
                    slab_cap=self.slab_cap, convolve="stresslet")
            u_near = near_apply_plan_sharded(
                plan, payload, self.a, self.mesh, kind="stresslet",
                poly_cut=self.r_cut if self.near_poly else None)
        else:
            bins_src, bins_trg = far_plan if far_plan is not None \
                else (None, None)
            u_far = far_stresslet_apply(grid, r_src.astype(dt),
                                        S.astype(dt), r_trg.astype(dt),
                                        slab_cap=self.slab_cap,
                                        bins_src=bins_src, bins_trg=bins_trg,
                                        wide=wide)
            u_near = near_apply_plan(
                plan, payload, self.a, kind="stresslet",
                poly_cut=self.r_cut if self.near_poly else None)
        return ((u_far + u_near) / (2.0 * eta)).astype(r_trg.dtype)

    def apply(self, r_src, S, r_trg, eta=1.0):
        """Velocity at targets from stresslet densities S (N,3,3) — the
        dense ``stresslet_apply`` signature."""
        return self.apply_with(self.spectra(), r_src, S, r_trg, eta)
