"""Electron-positron EOS table generation (numpy, build-time).

The reference's Helmholtz EOS (Microphysics eos/helmholtz; Timmes &
Swesty 2000) interpolates a precomputed table of the electron-positron
thermodynamics over (rho*Ye, T). The public helm_table.dat is not shipped
here, so we generate an equivalent table from first principles:
relativistic Fermi-Dirac integrals with pair production, solved for the
degeneracy parameter eta at each (rho*Ye, T) grid point by bisection on
charge neutrality.

    n-  - n+ = rho Ye N_A
    n+- = C  beta^1.5 [F_{1/2}(eta+-, beta) + beta F_{3/2}(eta+-, beta)]
    P+- = (2C/3) mc^2 beta^2.5 [F_{3/2} + (beta/2) F_{5/2}]
    E+- = C mc^2 beta^2.5 [F_{3/2} + beta F_{5/2}]  (+ 2 mc^2 n+ rest mass)
    eta+ = -eta - 2/beta,  beta = kT/(m_e c^2),  C = 8 pi sqrt(2) m^3 c^3/h^3

The table stores log10(P_e), log10(E_e per gram ... per volume) on a
(log10(rho*Ye), log10(T)) grid and is cached to disk.
"""

from __future__ import annotations

import os

import numpy as np

from castro_tpu.utils import constants as C

ME = 9.1093837015e-28  # g
MEC2 = ME * C.c_light**2
COEF = 8.0 * np.pi * np.sqrt(2.0) * (ME * C.c_light / C.hplanck) ** 3


def _fd_integral(k, eta, beta):
    """F_k(eta, beta) = int_0^inf x^k sqrt(1+beta x/2)/(exp(x-eta)+1) dx.

    Vectorized over eta (beta scalar). Composite Gauss-Legendre over
    [0, eta+40] (degenerate part) + tail transformed segment."""
    eta = np.atleast_1d(eta)
    upper = np.maximum(eta, 0.0) + 40.0
    nseg = 64
    # segment boundaries concentrated near x=eta
    out = np.zeros_like(eta)
    # fixed 16-point GL per segment
    xg, wg = np.polynomial.legendre.leggauss(16)
    for i in range(nseg):
        a = upper * i / nseg
        b = upper * (i + 1) / nseg
        xm = 0.5 * (a + b)[..., None] + 0.5 * (b - a)[..., None] * xg[None, :]
        wm = 0.5 * (b - a)[..., None] * wg[None, :]
        arg = xm - eta[..., None]
        f = xm**k * np.sqrt(1.0 + 0.5 * beta * xm) / (np.exp(np.clip(arg, -500, 500)) + 1.0)
        out = out + np.sum(wm * f, axis=-1)
    return out


def _pair_quantities(eta, beta):
    """(n_net, P, E_vol) for electrons+positrons at (eta, beta)."""
    b32 = beta**1.5
    b52 = beta**2.5

    def one(etax):
        f12 = _fd_integral(0.5, etax, beta)
        f32 = _fd_integral(1.5, etax, beta)
        f52 = _fd_integral(2.5, etax, beta)
        n = COEF * b32 * (f12 + beta * f32)
        P = (2.0 / 3.0) * COEF * MEC2 * b52 * (f32 + 0.5 * beta * f52)
        E = COEF * MEC2 * b52 * (f32 + beta * f52)
        return n, P, E

    n_m, P_m, E_m = one(eta)
    eta_p = -eta - 2.0 / beta
    n_p, P_p, E_p = one(eta_p)
    n_net = n_m - n_p
    P = P_m + P_p
    E = E_m + E_p + 2.0 * MEC2 * n_p  # pair rest-mass energy
    return n_net, P, E


def _solve_eta(ne_target, beta):
    """Bisection for eta with n_net(eta) = ne_target (vectorized)."""
    lo = np.full_like(ne_target, -200.0)
    hi = np.full_like(ne_target, 1e7)
    for _ in range(80):
        mid = 0.5 * (lo + hi)
        n_net, _, _ = _pair_quantities(mid, beta)
        too_low = n_net < ne_target
        lo = np.where(too_low, mid, lo)
        hi = np.where(too_low, hi, mid)
    return 0.5 * (lo + hi)


def build_table(n_d=129, n_t=81, logd_lo=-10.0, logd_hi=11.0,
                logt_lo=3.0, logt_hi=13.0, path=None, verbose=False):
    """Build (or load) the table. Axes: log10(rho*Ye) x log10(T).

    Returns dict with axes + log10 P_e [erg/cm^3] + log10 E_e [erg/cm^3]
    (volume energy density; per-gram conversion happens in the EOS)."""
    if path is None:
        path = os.path.join(os.path.dirname(__file__), "_helm_table_cache.npz")
    key = (n_d, n_t, logd_lo, logd_hi, logt_lo, logt_hi)
    if os.path.exists(path):
        data = np.load(path)
        if tuple(data["key"]) == key:
            return dict(logd=data["logd"], logt=data["logt"],
                        logp=data["logp"], loge=data["loge"])

    logd = np.linspace(logd_lo, logd_hi, n_d)
    logt = np.linspace(logt_lo, logt_hi, n_t)
    logp = np.zeros((n_d, n_t))
    loge = np.zeros((n_d, n_t))
    for j, lt in enumerate(logt):
        T = 10.0**lt
        beta = C.k_B * T / MEC2
        ne = 10.0**logd * C.N_A  # rho*Ye * N_A
        eta = _solve_eta(ne, beta)
        _, P, E = _pair_quantities(eta, beta)
        logp[:, j] = np.log10(np.maximum(P, 1e-300))
        loge[:, j] = np.log10(np.maximum(E, 1e-300))
        if verbose:
            print(f"  helm table column {j+1}/{n_t} (T=1e{lt:.1f})")
    np.savez_compressed(path, key=np.array(key), logd=logd, logt=logt,
                        logp=logp, loge=loge)
    return dict(logd=logd, logt=logt, logp=logp, loge=loge)
