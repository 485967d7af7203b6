"""Integrated-form Chebyshev penalty fiber (experimental family).

JAX counterpart of the reference's FiberChebyshevPenaltyAutodiff
(include/fiber_chebyshev_penalty_autodiff.hpp, include/skelly_fiber.hpp):
a 2D spectral fiber whose unknown is the 4th derivative's Chebyshev
coefficients plus integration constants; positions/derivatives are recovered
by spectral integration ("integrated form", which keeps the Newton system
well-conditioned at high order). The implicit backward-Euler system with a
penalty tension equation is solved by Newton iteration whose Jacobian comes
from jax.jacfwd — the exact role the reference fills with C++ forward-mode
autodiff dual types.

State layout XX = [X_w (n_nodes) | Y_w (n_nodes) | T_w (n_nodes_tension)] with
X_w = [XssssC (n_eq); D3 D2 D1 D0] (4 integration constants) and
T_w = [TssC (n_eq_T); C1 C0].

Physics (skelly_fiber.hpp:36-129):
  force density   F = −E X'''' + (T X')'          (per component)
  mobility        A F = (I + xs xsᵀ) F            (local SBT, nondimensional)
  evolution       X − dt·(A F) − dt·U − X_old = 0
  tension penalty 2 T'' − |xss|² T + 7 xss·X'''' + 6 xsss·X''' + U'·xs
                  + (xs·xs_new − 1)/dt = 0
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from skellysim_tpu.fibers import chebyshev as ch


class SpectralFiberState(NamedTuple):
    """All derivative coefficient stacks of one divided state
    (fiber_state.hpp:29-76)."""

    XssssC: jax.Array
    XsssC: jax.Array
    XssC: jax.Array
    XsC: jax.Array
    XC: jax.Array
    YssssC: jax.Array
    YsssC: jax.Array
    YssC: jax.Array
    YsC: jax.Array
    YC: jax.Array
    TssC: jax.Array
    TsC: jax.Array
    TC: jax.Array


class SpectralPenaltyFiber:
    """One 2D spectral fiber; sizes fixed at construction
    (fiber_chebyshev_penalty_autodiff.hpp:60-76)."""

    def __init__(self, n_nodes: int, n_nodes_tension: int,
                 n_equations: Optional[int] = None,
                 n_equations_tension: Optional[int] = None):
        self.n_nodes = n_nodes
        self.n_nodes_tension = n_nodes_tension
        self.n_equations = n_equations if n_equations is not None else n_nodes - 4
        self.n_equations_tension = (n_equations_tension if n_equations_tension
                                    is not None else n_nodes_tension - 2)
        IM = ch.integration_matrix(self.n_equations).copy()
        IM[0, :] = 0.0
        self.IM = jnp.asarray(IM)
        IMT = ch.integration_matrix(self.n_equations_tension).copy()
        IMT[0, :] = 0.0
        self.IMT = jnp.asarray(IMT)

    @property
    def state_size(self) -> int:
        return 2 * self.n_nodes + self.n_nodes_tension

    # ---- integrated-form reconstruction (…autodiff.hpp:93-165) ----
    def _integrate_up4(self, XssssC, rat, D):
        XsssC = (self.IM @ XssssC) * rat
        XsssC = XsssC.at[0].add(6.0 * D[3])
        XssC = (self.IM @ XsssC) * rat
        XssC = XssC.at[0].add(2.0 * D[2])
        XsC = (self.IM @ XssC) * rat
        XsC = XsC.at[0].add(D[1])
        XC = (self.IM @ XsC) * rat
        XC = XC.at[0].add(D[0])
        return XsssC, XssC, XsC, XC

    def _integrate_up_tension2(self, TssC, rat, C):
        TsC = (self.IMT @ TssC) * rat
        TsC = TsC.at[0].add(C[1])
        TC = (self.IMT @ TsC) * rat
        TC = TC.at[0].add(C[0])
        return TsC, TC

    def divide_and_construct(self, XX: jax.Array, L: float) -> SpectralFiberState:
        ne, net = self.n_equations, self.n_equations_tension
        n, nt = self.n_nodes, self.n_nodes_tension
        XW, YW, TW = XX[:n], XX[n:2 * n], XX[2 * n:]
        XssssC, DX = XW[:ne], XW[ne:]
        YssssC, DY = YW[:ne], YW[ne:]
        TssC, DT = TW[:net], TW[net:]
        rat = L / 2.0
        XsssC, XssC, XsC, XC = self._integrate_up4(XssssC, rat, DX)
        YsssC, YssC, YsC, YC = self._integrate_up4(YssssC, rat, DY)
        TsC, TC = self._integrate_up_tension2(TssC, rat, DT)
        return SpectralFiberState(XssssC, XsssC, XssC, XsC, XC,
                                  YssssC, YsssC, YssC, YsC, YC,
                                  TssC, TsC, TC)

    # ---- physics residual (skelly_fiber.hpp) ----
    def forces(self, div: SpectralFiberState, odiv: SpectralFiberState, E: float):
        ne = self.n_equations
        mul = lambda a, b: ch.multiply(a, b, ne)
        FxC = -E * div.XssssC + mul(div.TC, odiv.XssC) + mul(div.TsC, odiv.XsC)
        FyC = -E * div.YssssC + mul(div.TC, odiv.YssC) + mul(div.TsC, odiv.YsC)
        # local mobility (I + xs xsᵀ) ∘ F with the reference's grouping
        # (skelly_fiber.hpp:61-68): the MATRIX ENTRIES a_ij = δ_ij + xs_i xs_j
        # are formed first (each product truncated to n_equations), then
        # applied to F. Chebyshev multiplication is not associative under
        # truncation — grouping as xs·(xs·F) instead shifts the result at
        # ~1e-6 and breaks the Julia golden-data match
        # (julia_fiber_penalty_results.hpp).
        axx = mul(odiv.XsC, odiv.XsC).at[0].add(1.0)
        axy = mul(odiv.XsC, odiv.YsC)
        ayy = mul(odiv.YsC, odiv.YsC).at[0].add(1.0)
        AFxC = mul(axx, FxC) + mul(axy, FyC)
        AFyC = mul(axy, FxC) + mul(ayy, FyC)
        return FxC, FyC, AFxC, AFyC

    def evolution(self, AFxC, AFyC, div, odiv, UC, VC, dt):
        eqX = div.XC - dt * AFxC - dt * UC - odiv.XC
        eqY = div.YC - dt * AFyC - dt * VC - odiv.YC
        return eqX, eqY

    def penalty_tension(self, div, odiv, UsC, VsC, dt):
        net = self.n_equations_tension
        mul = lambda a, b: ch.multiply(a, b, net)
        WX = 7.0 * mul(odiv.XssC, div.XssssC) + 6.0 * mul(odiv.XsssC, div.XsssC)
        WY = 7.0 * mul(odiv.YssC, div.YssssC) + 6.0 * mul(odiv.YsssC, div.YsssC)
        W1 = mul(odiv.XssC, odiv.XssC) + mul(odiv.YssC, odiv.YssC)
        W2 = mul(UsC, odiv.XsC) + mul(VsC, odiv.YsC)
        W3 = mul(odiv.XsC, div.XsC) + mul(odiv.YsC, div.YsC)
        W3 = W3.at[0].add(-1.0)  # subtract the constant function 1
        WT = mul(div.TC, W1)
        return 2.0 * div.TssC[:net] - WT + WX + WY + W2 + W3 / dt

    def residual(self, XX, XX_old, L, E, dt, clamp_pos=(0.0, 0.0),
                 clamp_dir=(1.0, 0.0)):
        """Full Newton residual: evolution + penalty tension + BCs.

        Left end clamped (position + direction), right end free (zero moment
        and force), tension flux-free at the clamp and zero at the free end
        (skelly_fiber.hpp ClampedBC/FreeBC content).
        """
        div = self.divide_and_construct(XX, L)
        odiv = self.divide_and_construct(XX_old, L)
        UC = jnp.zeros(self.n_equations)
        VC = jnp.zeros(self.n_equations)
        _, _, AFxC, AFyC = self.forces(div, odiv, E)
        eqX, eqY = self.evolution(AFxC, AFyC, div, odiv, UC, VC, dt)
        eqT = self.penalty_tension(div, odiv, UC, VC, dt)

        bcX = jnp.stack([
            ch.eval_left(div.XC) - clamp_pos[0],
            ch.eval_left(div.XsC) - clamp_dir[0],
            ch.eval_right(div.XssC),
            ch.eval_right(div.XsssC),
        ])
        bcY = jnp.stack([
            ch.eval_left(div.YC) - clamp_pos[1],
            ch.eval_left(div.YsC) - clamp_dir[1],
            ch.eval_right(div.YssC),
            ch.eval_right(div.YsssC),
        ])
        bcT = jnp.stack([ch.eval_left(div.TsC), ch.eval_right(div.TC)])
        return jnp.concatenate([eqX, bcX, eqY, bcY, eqT, bcT])

    @functools.partial(jax.jit, static_argnums=0)
    def newton_step(self, XX, XX_old, L, E, dt):
        """One Newton iteration with a jacfwd Jacobian (the reference's
        autodiff dual-type role)."""
        res = self.residual(XX, XX_old, L, E, dt)
        J = jax.jacfwd(lambda z: self.residual(z, XX_old, L, E, dt))(XX)
        delta = jnp.linalg.solve(J, res)
        return XX - delta, jnp.linalg.norm(res)

    def solve_timestep(self, XX_old, L, E, dt, n_newton=8, tol=1e-11):
        XX = XX_old
        res_norm = np.inf
        for _ in range(n_newton):
            XX, res_norm = self.newton_step(XX, XX_old, L, E, dt)
            if float(res_norm) < tol:
                break
        return XX, float(res_norm)

    # ---- diagnostics ----
    def extensibility_error(self, XX, L):
        """max |xs·xs − 1| on the tension grid (skelly_fiber.hpp:203-220)."""
        div = self.divide_and_construct(XX, L)
        net = self.n_equations_tension
        err = (ch.multiply(div.XsC, div.XsC, net)
               + ch.multiply(div.YsC, div.YsC, net))
        err = err.at[0].add(-1.0)
        vals = jnp.asarray(ch.vandermonde(net)) @ err
        return jnp.max(jnp.abs(vals))

    def positions(self, XX, L, n_samples: int = 64):
        div = self.divide_and_construct(XX, L)
        V = jnp.asarray(ch.cheb_basis(ch.cheb_points(n_samples), self.n_equations))
        return jnp.stack([V @ div.XC, V @ div.YC], axis=1)

    def initial_straight(self, L, direction=(1.0, 0.0)):
        """State vector for a straight fiber from the origin along direction."""
        XX = np.zeros(self.state_size)
        n, ne = self.n_nodes, self.n_equations
        # integration-constant slots D[k] adjust the k-th derivative's constant
        # term: D[1] makes Xs ≡ direction, D[0] pins the left end
        dx, dy = direction
        XX[ne + 1] = dx
        XX[n + ne + 1] = dy
        jx = self.divide_and_construct(jnp.asarray(XX), L)
        XX[ne + 0] -= float(ch.eval_left(jx.XC))
        XX[n + ne + 0] -= float(ch.eval_left(jx.YC))
        return jnp.asarray(XX)
