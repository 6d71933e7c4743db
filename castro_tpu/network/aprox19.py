"""aprox19: 19-isotope network with hydrogen burning (pp chain + CNO),
helium burning, the alpha chain to Ni56, and the Fe54 photodisintegration
link — the network used by the massive_star / xrb_mixed science problems.

Reference: Microphysics networks/aprox19 (Weaver, Zimmerman & Woosley
1978 approx19), `NETWORK_DIR := aprox19`; burned via `burner()` from
`Source/reactions/Castro_react.cpp:123`.  The Microphysics submodule is
empty in this checkout, so rates come from their published sources:

- p(p,e+nu)d               : CF88 fit; d(p,g)he3 assumed instantaneous
                             (effective 3 H1 -> He3 at the pp rate)
- he3(he3,2p)he4           : CF88
- CNO cycle                : bottlenecked by n14(p,g)o15 (CF88); the full
                             cycle 4 H1 -> He4 runs at that rate with N14
                             as catalyst; c12(p,g)..(p,g)n14 transfers
                             C12 into the N14 reservoir (CF88 c12(p,g))
- n14 + 3/2 he4 -> ne20    : the n14(a,g)f18(...)ne20 shortcut of
                             approx19, Gamow non-resonant form
- alpha chain c12..ni56    : identical machinery to aprox13 (CF88 +
                             Gamow forms + detailed-balance reverses +
                             Graboske weak screening)
- fe54 + 2 p <-> ni56      : proton-capture bottleneck fe54(p,g)co55
                             (Gamow form) with the 2-step detailed-balance
                             reverse — the approx19 Ye-flexible iron link
- he3(a,g)be7, o16(p,g),   : omitted (documented); the deep
  free n/p photodisintegration dynamics                photodisintegration
                             regime (T9 >~ 5-6) is handled by the NSE
                             composition solver (`network/nse.py`), as in
                             the reference's aprox19+NSE configuration.

Energy generation uses mass excesses (exact for weak interactions, where
binding energies alone are not), minus the standard neutrino losses per
weak link (0.265 MeV per p+p, 1.71 MeV per CNO cycle, 1.0 MeV per
c12->n14 transfer).  Thermal (sneut5) neutrino losses are omitted as in
aprox13 (documented).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from castro_tpu.network.base import Network
from castro_tpu.network.aprox13 import (_cf88_rates, _gamow_ag, _T9_FLOOR,
                                        _A as _A13, _Z as _Z13,
                                        _B_MEV as _B13)
from castro_tpu.utils import constants as C

_SPECIES = ("H1", "He3", "He4", "C12", "N14", "O16", "Ne20", "Mg24",
            "Si28", "S32", "Ar36", "Ca40", "Ti44", "Cr48", "Fe52",
            "Fe54", "Ni56", "n", "p")

_A = np.array([1, 3, 4, 12, 14, 16, 20, 24, 28, 32, 36, 40, 44, 48, 52,
               54, 56, 1, 1], dtype=float)
_Z = np.array([1, 2, 2, 6, 7, 8, 10, 12, 14, 16, 18, 20, 22, 24, 26, 26,
               28, 0, 1], dtype=float)
# total binding energies (MeV)
_B_MEV = np.array([0.0, 7.71819, 28.29603, 92.16294, 104.65998,
                   127.62093, 160.64788, 198.25790, 236.53790, 271.78250,
                   306.72020, 342.05680, 375.47720, 411.46900, 447.70800,
                   471.76300, 483.99500, 0.0, 0.0])
# mass excesses (MeV) — AME: Delta = (M - A m_u) c^2
_DM_MEV = np.array([7.28897, 14.93121, 2.42492, 0.0, 2.86342, -4.73700,
                    -7.04193, -13.93336, -21.49280, -26.01590, -30.23040,
                    -34.84630, -37.54840, -42.81910, -48.33000, -56.24940,
                    -53.90000, 8.07132, 7.28897])

(IH1, IHE3, IHE4, IC12, IN14, IO16, INE20, IMG24, ISI28, IS32, IAR36,
 ICA40, ITI44, ICR48, IFE52, IFE54, INI56, INEUT, IPROT) = range(19)

# map the aprox13 alpha-chain species (he4, c12..ni56) into this table
_CHAIN = [IHE4, IC12, IO16, INE20, IMG24, ISI28, IS32, IAR36, ICA40,
          ITI44, ICR48, IFE52, INI56]


def _rev_fac(q_mev, a1, a2, a12, T9):
    afac = (a1 * a2 / a12) ** 1.5
    return 9.8685e9 * T9 ** 1.5 * afac * jnp.exp(
        jnp.maximum(-q_mev * 11.6045 / T9, -200.0))


def _gamow(z1, z2, a1, a2, T9, s_eff=100.0):
    """Non-resonant Gamow-window capture rate (see aprox13._gamow_ag)."""
    ahat = a1 * a2 / (a1 + a2)
    tau = 4.2487 * (z1 * z1 * z2 * z2 * ahat / T9) ** (1.0 / 3.0)
    pref = 7.83e9 * (z1 * z2 / (ahat * T9 * T9)) ** (1.0 / 3.0) * s_eff
    return pref * jnp.exp(-tau)


class Aprox19Network(Network):
    reactive = True

    def __init__(self, include_neutrinos=True):
        ebin = _B_MEV * C.MeV2erg * C.N_A / _A
        super().__init__(_SPECIES, aion=_A, zion=_Z, ebin=ebin)
        self.include_neutrinos = include_neutrinos

    def _screen_weak(self, rho, T9, Y, z1, z2, _moments=None):
        """Weak + strong screening (as aprox13; screening.py); the rhs
        passes the composition moments once via `_moments`."""
        from castro_tpu.network import screening

        if _moments is None:
            _moments = screening.plasma_moments(Y, _Z)
        zeta, ye = _moments
        return screening.screen_pair(rho, jnp.maximum(T9, _T9_FLOOR),
                                     zeta, ye, z1, z2)

    def rhs(self, rho, T, xn, e=None):
        T9 = jnp.maximum(T * 1.0e-9, _T9_FLOOR)
        T913 = T9 ** (1.0 / 3.0)
        T9m13 = 1.0 / T913
        T9m23 = T9m13 * T9m13
        T9m32 = 1.0 / (T9 * jnp.sqrt(T9))
        Y = xn / self.aion.reshape((-1,) + (1,) * (xn.ndim - 1))
        Y = jnp.maximum(Y, 0.0)

        # screening composition moments computed once for all links
        from castro_tpu.network import screening as _scrmod

        moments = _scrmod.plasma_moments(Y, _Z)

        def scr(z1, z2):
            return self._screen_weak(rho, T9, Y, z1, z2, _moments=moments)

        cf = _cf88_rates(T9)
        ydot = [jnp.zeros_like(rho) for _ in range(19)]
        enu = jnp.zeros_like(rho)  # neutrino losses, MeV/mol/s units

        def add(idx_changes, rate):
            for i, w in idx_changes:
                ydot[i] = ydot[i] + w * rate

        # ---- hydrogen burning ---------------------------------------------
        # p(p,e+nu)d — CF88; d(p,g)he3 instantaneous: 3 H1 -> He3
        scr_pp = scr(1.0, 1.0)
        lam_pp = 4.01e-15 * T9m23 * jnp.exp(-3.380 * T9m13) * (
            1.0 + 0.123 * T913 + 1.09 * T913 * T913 + 0.938 * T9)
        r_pp = 0.5 * rho * Y[IH1] * Y[IH1] * lam_pp * scr_pp
        add([(IH1, -3.0), (IHE3, 1.0)], r_pp)
        enu = enu + 0.265 * r_pp  # pp neutrino

        # he3(he3,2p)he4 — CF88
        scr_33 = scr(2.0, 2.0)
        lam_33 = 6.04e10 * T9m23 * jnp.exp(-12.276 * T9m13) * (
            1.0 + 0.034 * T913 - 0.522 * T913 * T913 - 0.124 * T9 +
            0.353 * T9 ** (4.0 / 3.0) + 0.213 * T9 ** (5.0 / 3.0))
        r_33 = 0.5 * rho * Y[IHE3] * Y[IHE3] * lam_33 * scr_33
        add([(IHE3, -2.0), (IHE4, 1.0), (IH1, 2.0)], r_33)

        # CNO cycle at the n14(p,g)o15 bottleneck — CF88
        scr_np = scr(1.0, 7.0)
        lam_n14pg = (4.90e7 * T9m23 * jnp.exp(-15.228 * T9m13 -
                                              (T9 / 3.294) ** 2) *
                     (1.0 + 0.027 * T913 - 0.778 * T913 * T913 -
                      0.149 * T9 + 0.261 * T9 ** (4.0 / 3.0) +
                      0.127 * T9 ** (5.0 / 3.0))
                     + 2.37e3 * T9m32 * jnp.exp(-3.011 / T9)
                     + 2.19e4 * jnp.exp(-12.530 / T9))
        r_cno = rho * Y[IH1] * Y[IN14] * lam_n14pg * scr_np
        add([(IH1, -4.0), (IHE4, 1.0)], r_cno)  # catalytic cycle
        enu = enu + 1.71 * r_cno  # two beta+ per cycle

        # c12(p,g)n13(b+)c13(p,g)n14 — CF88 c12(p,g) bottleneck
        scr_cp = scr(1.0, 6.0)
        lam_c12pg = (2.04e7 * T9m23 * jnp.exp(-13.690 * T9m13 -
                                              (T9 / 1.500) ** 2) *
                     (1.0 + 0.030 * T913 + 1.19 * T913 * T913 +
                      0.254 * T9 + 2.06 * T9 ** (4.0 / 3.0) +
                      1.12 * T9 ** (5.0 / 3.0))
                     + 1.08e5 * T9m32 * jnp.exp(-4.925 / T9)
                     + 2.15e5 * T9m32 * jnp.exp(-18.179 / T9))
        r_c12pg = rho * Y[IH1] * Y[IC12] * lam_c12pg * scr_cp
        add([(IH1, -2.0), (IC12, -1.0), (IN14, 1.0)], r_c12pg)
        enu = enu + 1.0 * r_c12pg  # one beta+ in the transfer

        # ---- helium burning + alpha chain (aprox13 machinery) -------------
        scr3a = scr(2.0, 2.0) * \
            scr(2.0, 4.0)
        T8 = 10.0 * T9
        q3a_erg_per_mol = 7.275 * C.MeV2erg * C.N_A
        lam3a_T = 5.09e11 * 64.0 / (T8 ** 3) * jnp.exp(-44.027 / T8) * \
            6.0 / q3a_erg_per_mol
        r3a = rho * rho * Y[IHE4] ** 3 / 6.0 * lam3a_T * scr3a
        rg3a = lam3a_T / 6.0 * 2.00e20 * T9 ** 3 * jnp.exp(
            jnp.maximum(-84.424 / T9, -200.0)) * Y[IC12]
        add([(IHE4, -3.0), (IC12, 1.0)], r3a - rg3a)

        scr_cc = scr(6.0, 6.0)
        rcc = 0.5 * rho * Y[IC12] * Y[IC12] * cf["c12c12"] * scr_cc
        add([(IC12, -2.0), (INE20, 1.0), (IHE4, 1.0)], rcc)

        scr_co = scr(6.0, 8.0)
        rco = rho * Y[IC12] * Y[IO16] * cf["c12o16"] * scr_co
        add([(IC12, -1.0), (IO16, -1.0), (IMG24, 1.0), (IHE4, 1.0)], rco)

        scr_oo = scr(8.0, 8.0)
        roo = 0.5 * rho * Y[IO16] * Y[IO16] * cf["o16o16"] * scr_oo
        add([(IO16, -2.0), (ISI28, 1.0), (IHE4, 1.0)], roo)

        # n14 + 3/2 he4 -> ne20 (approx19 shortcut through f18/o18)
        scr_na = scr(2.0, 7.0)
        lam_n14ag = _gamow(2.0, 7.0, 4.0, 14.0, T9, s_eff=10.0)
        r_nag = rho * Y[IHE4] * Y[IN14] * lam_n14ag * scr_na
        add([(IN14, -1.0), (IHE4, -1.5), (INE20, 1.0)], r_nag)

        # (a,g) chain c12..ni56 with detailed-balance reverses
        lam_ag = [cf["c12ag"], cf["o16ag"], cf["ne20ag"], cf["mg24ag"]] + \
            [_gamow_ag(k, T9) for k in range(5, 12)]
        for j in range(1, 12):
            k, kp1 = _CHAIN[j], _CHAIN[j + 1]
            lam = lam_ag[j - 1] * scr(2.0, _Z[k])
            q = float(_B13[j + 1] - _B13[j] - _B13[0])
            fwd = rho * Y[IHE4] * Y[k] * lam
            rev = _rev_fac(q, 4.0, _A[k], _A[kp1], T9) * lam * Y[kp1]
            add([(IHE4, -1.0), (k, -1.0), (kp1, 1.0)], fwd - rev)

        # ---- iron-group Ye link: fe54 + 2p <-> ni56 ------------------------
        scr_fp = scr(1.0, 26.0)
        lam_fp = _gamow(1.0, 26.0, 1.0, 54.0, T9, s_eff=10.0)
        q_54 = float(_B_MEV[INI56] - _B_MEV[IFE54])  # 2 B_p = 0
        fwd = rho * rho * Y[IPROT] ** 2 * Y[IFE54] * lam_fp * scr_fp
        rev2 = (9.8685e9 * T9 ** 1.5) ** 2 * \
            (1.0 * 1.0 * 54.0 / 56.0) ** 1.5 * jnp.exp(
                jnp.maximum(-q_54 * 11.6045 / T9, -200.0))
        rev = rev2 * lam_fp * Y[INI56]
        add([(IPROT, -2.0), (IFE54, -1.0), (INI56, 1.0)], fwd - rev)

        ydot_arr = jnp.stack(ydot)
        xdot = ydot_arr * self.aion.reshape((-1,) + (1,) * (xn.ndim - 1))
        # energy from mass excesses (handles the weak links), minus
        # neutrino losses
        dm = jnp.asarray(_DM_MEV * C.MeV2erg * C.N_A).reshape(
            (-1,) + (1,) * (xn.ndim - 1))
        edot = -jnp.sum(ydot_arr * dm, axis=0) - enu * C.MeV2erg * C.N_A
        if self.include_neutrinos:
            from castro_tpu.network.neutrino import sneut

            ysum = jnp.maximum(jnp.sum(jnp.stack(
                [Y[k] for k in range(19)]), axis=0), 1e-300)
            abar = 1.0 / ysum
            zbar = abar * jnp.sum(jnp.stack(
                [_Z[k] * Y[k] for k in range(19)]), axis=0)
            edot = edot - sneut(rho, T, abar, zbar)
        return xdot, edot
