"""Nuclear statistical equilibrium composition solver.

The reference couples aprox19 (and the NSE-enabled nets) to a tabulated
NSE composition above a density/temperature threshold
(Microphysics nse_tabular; Castro's `in_nse` gating in
`Source/reactions/Castro_react.cpp` / burn_t.in_nse).  Instead of a
table, this solves the Saha NSE system directly on-device — a 2D Newton
iteration in the proton/neutron fugacities, fully vectorized over zones
(every zone iterates together; fixed trip count so it jits to a single
fused loop):

    Y_i = g_i A_i^{3/2} theta u^{Z_i} v^{N_i} exp(B_i / kT)
    theta = (m_u k T / 2 pi hbar^2)^{3/2} / (rho N_A)

subject to  sum A_i Y_i = 1  and  sum Z_i Y_i = Ye.  All sums are done
with a log-sum-exp shift so the huge Boltzmann factors never overflow.

Validity: ideal Boltzmann nuclei, ground-state spins (partition functions
~ g_gs below T9 ~ 10), no Coulomb corrections.  That matches the fidelity
of this package's rate set (see aprox13.py provenance notes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from castro_tpu.utils import constants as C

_KB_MEV = C.k_B / C.MeV2erg  # MeV/K
T_HI = 3.0e10  # continuation start: fully dissociated nucleon gas


def make_nse_solver(network, iters=60):
    """Build nse(rho, T, ye) -> (X [nspec,...], dYdt-free abar/zbar info).

    network must expose aion, zion, ebin (erg/g binding) and optionally
    `gspin` (ground-state degeneracies 2J+1; defaults: 2 for A=1, 1
    otherwise — correct for the even-even alpha nuclei, n, p, h1)."""
    A = np.asarray(network.aion)
    Z = np.asarray(network.zion)
    N = A - Z
    B_mev = np.asarray(network.ebin) * A / (C.MeV2erg * C.N_A)
    g = getattr(network, "gspin", None)
    if g is None:
        g = np.where(A == 1, 2.0, 1.0)
        # common non-even-even light nuclei
        for name, gval in (("He3", 2.0), ("N14", 3.0)):
            if name in network.spec_names:
                g[network.spec_names.index(name)] = gval
    lg = np.log(np.asarray(g, dtype=float)) + 1.5 * np.log(A)

    A_j = jnp.asarray(A)
    Z_j = jnp.asarray(Z)
    N_j = jnp.asarray(N)
    B_j = jnp.asarray(B_mev)
    lg_j = jnp.asarray(lg)
    # networks whose species all share one Z/A (e.g. iso7, aprox13: pure
    # alpha nuclei) make the charge constraint redundant — the 2x2 Newton
    # system is singular and the solve reduces to 1D in a+b
    degenerate = bool(np.allclose(Z / A, Z[0] / A[0]))

    def nse(rho, T, ye):
        """rho, T, ye: same-shape arrays. Returns X [nspec, *shape]."""
        shape = jnp.shape(rho)
        kT = _KB_MEV * T  # MeV
        nq = (C.m_u * C.k_B * T / (2.0 * np.pi *
                                   (C.hplanck / (2.0 * np.pi)) ** 2)) ** 1.5
        ltheta = jnp.log(nq / (rho * C.N_A))
        sh = (-1,) + (1,) * len(shape)

        def logY(a, b, kT_=None, ltheta_=None):
            kT_ = kT if kT_ is None else kT_
            ltheta_ = ltheta if ltheta_ is None else ltheta_
            return (lg_j.reshape(sh) + ltheta_[None] +
                    Z_j.reshape(sh) * a[None] + N_j.reshape(sh) * b[None] +
                    B_j.reshape(sh) / kT_[None])

        # initial guess: free nucleons only (Y_p = ye, Y_n = 1 - ye)
        a = jnp.log(jnp.maximum(ye, 1e-10)) - ltheta - jnp.log(2.0)
        b = jnp.log(jnp.maximum(1.0 - ye, 1e-10)) - ltheta - jnp.log(2.0)

        def body_1d(carry, _):
            a, b = carry
            t = logY(a, b)
            m = jnp.max(t, axis=0)
            et = jnp.exp(t - m[None])
            SA = jnp.maximum(jnp.sum(A_j.reshape(sh) * et, axis=0), 1e-300)
            SAA = jnp.sum((A_j * A_j).reshape(sh) * et, axis=0)
            G1 = m + jnp.log(SA)
            # G1(s) is convex increasing in s (log-sum-exp of affine
            # terms), so the raw Newton step converges globally — a
            # clipped step cannot cross the O(B/kT) fugacity distances a
            # cold evaluation needs
            ds = -G1 / (0.5 * SAA / SA)
            return (a + 0.5 * ds, b + 0.5 * ds), None

        if degenerate:
            (a, b), _ = jax.lax.scan(body_1d, (a, b), None, length=iters)
        else:
            # A plain 2D Newton in (a, b) oscillates through the
            # dissociation transition (the Jacobian is near-singular: the
            # a+b direction is stiff, a-b nearly flat when nucleons
            # underflow).  Instead: the charge fraction at fixed mass is
            # MONOTONE in d = a - b (raising the proton fugacity against
            # the neutron one always makes the mix more proton-rich), so
            # bisect on d, with an inner warm-started 1D Newton in
            # s = a + b for the mass constraint (also monotone).
            def solve_mass(d, s):
                def step(s, _):
                    t = logY(0.5 * (s + d), 0.5 * (s - d))
                    m = jnp.max(t, axis=0)
                    et = jnp.exp(t - m[None])
                    SA = jnp.maximum(jnp.sum(A_j.reshape(sh) * et, axis=0),
                                     1e-300)
                    SAA = jnp.sum((A_j * A_j).reshape(sh) * et, axis=0)
                    G1 = m + jnp.log(SA)
                    # convex increasing in s: raw Newton is global
                    return s - G1 / (0.5 * SAA / SA), None
                s, _ = jax.lax.scan(step, s, None, length=14)
                return s

            def ye_of(d, s):
                t = logY(0.5 * (s + d), 0.5 * (s - d))
                m = jnp.max(t, axis=0)
                et = jnp.exp(t - m[None])
                SA = jnp.maximum(jnp.sum(A_j.reshape(sh) * et, axis=0),
                                 1e-300)
                SZ = jnp.sum(Z_j.reshape(sh) * et, axis=0)
                return SZ / SA

            d0 = a - b
            s0 = a + b
            lo = d0 - 600.0
            hi = d0 + 600.0

            def bis(carry, _):
                lo, hi, s = carry
                mid = 0.5 * (lo + hi)
                s = solve_mass(mid, s)
                too_low = ye_of(mid, s) < ye
                lo = jnp.where(too_low, mid, lo)
                hi = jnp.where(too_low, hi, mid)
                return (lo, hi, s), None

            (lo, hi, s0), _ = jax.lax.scan(bis, (lo, hi, s0), None,
                                           length=max(iters, 80))
            d = 0.5 * (lo + hi)
            s = solve_mass(d, s0)
            a = 0.5 * (s + d)
            b = 0.5 * (s - d)
        t = logY(a, b)
        Yi = jnp.exp(jnp.clip(t, -300.0, 300.0))
        X = A_j.reshape(sh) * Yi
        # exact renormalization guards round-off in sum A Y = 1
        X = X / jnp.maximum(jnp.sum(X, axis=0), 1e-300)
        return X

    return nse


def nse_ebind(network, X):
    """Specific nuclear binding energy (erg/g) of composition X — used to
    account the energy release when a zone is driven to NSE."""
    sh = (-1,) + (1,) * (X.ndim - 1)
    return jnp.sum(jnp.asarray(network.ebin).reshape(sh) * X, axis=0)
