"""Thermal neutrino energy losses (reference: Microphysics `sneut5`,
called from every aprox-network RHS; Castro couples it through the
burner, `Source/reactions/Castro_react.cpp:123`).

Provenance note (zero-egress build; the Microphysics submodule is empty
in this checkout): the pair-annihilation channel implements the Itoh et
al. (1996, ApJS 102, 411) fitting formula with their published
coefficients; bremsstrahlung uses the standard liquid-metal-phase
approximation eps ~ 0.3034 (Z^2/A) T8^6 erg/g/s (Itoh & Kohyama 1983
leading term). The photo- and plasma-neutrino channels and the
relativistic corrections of the full sneut5 are NOT included — pair
dominates for T9 >~ 2 (detonations, NSE regions) and brems for cool
degenerate interiors; the omission is documented here and in tests.
"""

from __future__ import annotations

import jax.numpy as jnp


def sneut_pair(rho, T, abar, zbar):
    """Pair-annihilation neutrino loss rate, erg/g/s (Itoh et al. 1996).

    Q_pair = g(lambda) exp(-2/lambda) f_pair; lambda = T/5.9302e9 K,
    xi = ((rho/mu_e)/1e9)^(1/3)/lambda."""
    mu_e_inv = zbar / abar  # 1/mu_e
    rm = rho * mu_e_inv
    lam = T / 5.9302e9
    lam = jnp.maximum(lam, 1e-10)
    xi = (rm * 1e-9) ** (1.0 / 3.0) / lam

    gl = 1.0 - 13.04 * lam**2 + 133.5 * lam**4 + 1534.0 * lam**6 \
        + 918.6 * lam**8
    gl = jnp.maximum(gl, 0.0)

    # low-T (T < 1e10 K) and high-T coefficient sets, blended at 1e10
    def fpair(a0, a1, a2, b1, b2, b3, c):
        num = (a0 + a1 * xi + a2 * xi * xi) * jnp.exp(-c * xi)
        den = xi**3 + b1 / lam + b2 / lam**2 + b3 / lam**3
        return num / jnp.maximum(den, 1e-300)

    f_lo = fpair(6.002e19, 2.084e20, 1.872e21,
                 9.383e-1, -4.141e-1, 5.829e-2, 5.5924)
    f_hi = fpair(6.002e19, 2.084e20, 1.872e21,
                 1.2383, -8.141e-1, 0.0, 4.9924)
    f = jnp.where(T < 1.0e10, f_lo, f_hi)

    q_cm3 = gl * jnp.exp(-2.0 / lam) * f  # erg / cm^3 / s
    return q_cm3 / jnp.maximum(rho, 1e-300)


def sneut_brems(rho, T, abar, zbar):
    """Bremsstrahlung neutrino losses, erg/g/s (liquid-metal leading
    term, Itoh & Kohyama 1983): eps ~ 0.3034 (Z^2/A) T8^6."""
    T8 = T * 1e-8
    return 0.3034 * (zbar * zbar / abar) * T8**6


def sneut(rho, T, abar, zbar):
    """Total implemented thermal neutrino loss, erg/g/s (>= 0)."""
    return sneut_pair(rho, T, abar, zbar) + sneut_brems(rho, T, abar, zbar)
