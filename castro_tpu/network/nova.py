"""nova: hot-CNO network for classical nova envelopes (reference:
Microphysics networks/nova, selected by `Exec/science/nova/GNUmakefile`
`NETWORK_DIR := nova`).  The Microphysics submodule is empty in this
checkout, so the network is rebuilt from its published sources: the
CF88 (Caughlan & Fowler 1988) analytic CNO rate fits plus the measured
beta+ half-lives of the short-lived CNO nuclei.

Carried nuclei (14): H1, He3, He4, C12, C13, N13, N14, N15, O14, O15,
O16, O17, F17, F18 — the full hot/cold CNO bi-cycle with the explicit
beta-limited isotopes that distinguish a nova burst (the reference
roster additionally carries d/Be7/B8 for the pp-II/III chains, which
are energetically negligible in a CNO-enriched nova envelope;
documented omission).

Links:
  p(p,e+nu)d(p,g)he3          CF88 pp (d instantaneous, as aprox19)
  he3(he3,2p)he4              CF88
  c12(p,g)n13                 CF88
  n13(e+nu)c13                t1/2 = 9.965 min
  n13(p,g)o14                 CF88 (hot-CNO branch)
  c13(p,g)n14                 CF88
  n14(p,g)o15                 CF88 (cold-CNO bottleneck)
  o14(e+nu)n14                t1/2 = 70.62 s   (hot-CNO clock)
  o15(e+nu)n15                t1/2 = 122.24 s  (hot-CNO clock)
  n15(p,a)c12                 CF88 (cycle-1 closure)
  n15(p,g)o16                 CF88 (leak to cycle 2)
  o16(p,g)f17                 CF88
  f17(e+nu)o17                t1/2 = 64.49 s
  o17(p,a)n14                 CF88-era fit (cycle-2 closure)
  o17(p,g)f18                 CF88-era fit
  f18(p,a)o15                 Gamow form (Utku et al. 1998 scale)
  3 he4 -> c12                composite 3-alpha (as aprox13)

Energetics from AME mass excesses (exact across the weak links), minus
mean neutrino energies per decay: <E_nu> = 0.706 (N13), 1.00 (O15),
0.97 (F17) MeV (standard CNO values) and Q_nu ~ 0.5 * <Q_beta+> for O14
(equipartition approximation; documented).  Thermal neutrino losses via
`network/neutrino.py` sneut.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from castro_tpu.network.base import Network
from castro_tpu.network.aprox13 import _T9_FLOOR
from castro_tpu.utils import constants as C

_SPECIES = ("H1", "He3", "He4", "C12", "C13", "N13", "N14", "N15",
            "O14", "O15", "O16", "O17", "F17", "F18")
_A = np.array([1, 3, 4, 12, 13, 13, 14, 15, 14, 15, 16, 17, 17, 18],
              dtype=float)
_Z = np.array([1, 2, 2, 6, 6, 7, 7, 7, 8, 8, 8, 8, 9, 9], dtype=float)
# AME mass excesses Delta = (M - A m_u) c^2  [MeV]
_DM_MEV = np.array([7.28897, 14.93121, 2.42492, 0.0, 3.12501, 5.34516,
                    2.86342, 0.10144, 8.00736, 2.85560, -4.73700,
                    -0.80877, 1.95170, 0.87310])

(IH1, IHE3, IHE4, IC12, IC13, IN13, IN14, IN15, IO14, IO15, IO16, IO17,
 IF17, IF18) = range(14)

_LN2 = float(np.log(2.0))
# beta+ decay rates [1/s] from measured half-lives
_LAM_N13 = _LN2 / 597.9     # 9.965 min
_LAM_O14 = _LN2 / 70.62
_LAM_O15 = _LN2 / 122.24
_LAM_F17 = _LN2 / 64.49
# mean neutrino energy per decay [MeV]
_ENU_N13 = 0.706
# O14 beta+ goes >99% to the 2.313 MeV excited state of N14 (the
# superallowed branch, endpoint 1.81 MeV), so <E_nu> ~ equipartition of
# the EXCITED-state branch Q, ~0.8 MeV — not half the ground-state Q
_ENU_O14 = 0.8
_ENU_O15 = 1.00
_ENU_F17 = 0.97


def cno_rates(T9):
    """CF88 analytic N_A<sigma v> fits [cm^3/mol/s] for the CNO
    proton-capture links (Caughlan & Fowler 1988, ADNDT 40, 283).
    Shared by the nova and rprox networks."""
    T913 = T9 ** (1.0 / 3.0)
    T923 = T913 * T913
    T943 = T9 * T913
    T953 = T9 * T923
    T9m13 = 1.0 / T913
    T9m23 = 1.0 / T923
    T9m32 = 1.0 / (T9 * jnp.sqrt(T9))
    r = {}

    # c12(p,g)n13
    r["c12pg"] = (2.04e7 * T9m23 * jnp.exp(-13.690 * T9m13 -
                                           (T9 / 1.500) ** 2) *
                  (1.0 + 0.030 * T913 + 1.19 * T923 + 0.254 * T9 +
                   2.06 * T943 + 1.12 * T953)
                  + 1.08e5 * T9m32 * jnp.exp(-4.925 / T9)
                  + 2.15e5 * T9m32 * jnp.exp(-18.179 / T9))

    # c13(p,g)n14
    r["c13pg"] = (8.01e7 * T9m23 * jnp.exp(-13.717 * T9m13 -
                                           (T9 / 2.000) ** 2) *
                  (1.0 + 0.030 * T913 + 0.958 * T923 + 0.204 * T9 +
                   1.39 * T943 + 0.753 * T953)
                  + 1.21e6 * T9 ** (-0.65) * jnp.exp(-5.701 / T9))

    # n13(p,g)o14
    r["n13pg"] = (4.04e7 * T9m23 * jnp.exp(-15.202 * T9m13 -
                                           (T9 / 1.191) ** 2) *
                  (1.0 + 0.027 * T913 - 0.803 * T923 - 0.154 * T9 +
                   5.00 * T943 + 2.44 * T953)
                  + 2.43e5 * T9m32 * jnp.exp(-6.348 / T9))

    # n14(p,g)o15
    r["n14pg"] = (4.90e7 * T9m23 * jnp.exp(-15.228 * T9m13 -
                                           (T9 / 3.294) ** 2) *
                  (1.0 + 0.027 * T913 - 0.778 * T923 - 0.149 * T9 +
                   0.261 * T943 + 0.127 * T953)
                  + 2.37e3 * T9m32 * jnp.exp(-3.011 / T9)
                  + 2.19e4 * jnp.exp(-12.530 / T9))

    # n15(p,a)c12
    r["n15pa"] = (1.08e12 * T9m23 * jnp.exp(-15.251 * T9m13 -
                                            (T9 / 0.522) ** 2) *
                  (1.0 + 0.027 * T913 + 2.62 * T923 + 0.501 * T9 +
                   5.36 * T943 + 2.60 * T953)
                  + 1.19e8 * T9m32 * jnp.exp(-3.676 / T9)
                  + 5.41e8 / jnp.sqrt(T9) * jnp.exp(-8.926 / T9))

    # n15(p,g)o16
    r["n15pg"] = (9.78e8 * T9m23 * jnp.exp(-15.251 * T9m13 -
                                           (T9 / 0.450) ** 2) *
                  (1.0 + 0.027 * T913 + 0.219 * T923 + 0.042 * T9 +
                   6.83 * T943 + 3.32 * T953)
                  + 1.11e4 * T9m32 * jnp.exp(-3.328 / T9)
                  + 1.49e4 * T9m32 * jnp.exp(-4.665 / T9)
                  + 3.80e6 * T9m32 * jnp.exp(-11.048 / T9))

    # o16(p,g)f17 (the CF88 closed form)
    r["o16pg"] = (1.50e8 / (T923 * (1.0 + 2.13 *
                                    (1.0 - jnp.exp(-0.728 * T923)))) *
                  jnp.exp(-16.692 * T9m13))

    # o17(p,a)n14 — leading non-resonant + 66 keV resonance terms of the
    # CF88-era fit (Landre et al. 1990 scale)
    r["o17pa"] = (1.53e7 * T9m23 * jnp.exp(-16.712 * T9m13 -
                                           (T9 / 0.565) ** 2) *
                  (1.0 + 0.025 * T913 + 5.39 * T923 + 0.940 * T9)
                  + 2.92e6 * T9 * jnp.exp(-4.247 / T9))

    # o17(p,g)f18 — non-resonant + low-lying resonance terms (same era)
    r["o17pg"] = (7.97e7 * (T9 / (1.0 + 2.69 * T9)) ** (5.0 / 6.0) *
                  T9m32 * jnp.exp(-16.712 * T9m13)
                  + 1.51e8 * T9m23 * jnp.exp(-16.712 * T9m13) * 1.0e-2)

    # f18(p,a)o15 — Gamow window scaled to the Utku et al. (1998)
    # recommended rate magnitude near T9 ~ 0.2-0.4
    T9m = jnp.maximum(T9, _T9_FLOOR)
    tau = 4.2487 * (9.0 * 9.0 * (18.0 / 19.0) / T9m) ** (1.0 / 3.0)
    r["f18pa"] = 2.9e11 * (9.0 / ((18.0 / 19.0) * T9m * T9m)) ** (
        1.0 / 3.0) * jnp.exp(-tau)
    return r


class NovaNetwork(Network):
    reactive = True

    def __init__(self, include_neutrinos=True):
        # ebin from mass excesses: B(A,Z) = Z dm_H + N dm_n - dm(A,Z)
        b_mev = _Z * 7.28897 + (_A - _Z) * 8.07132 - _DM_MEV
        ebin = b_mev * C.MeV2erg * C.N_A / _A
        super().__init__(_SPECIES, aion=_A, zion=_Z, ebin=ebin)
        self.include_neutrinos = include_neutrinos

    def rhs(self, rho, T, xn, e=None):
        T9 = jnp.maximum(T * 1.0e-9, _T9_FLOOR)
        Y = jnp.maximum(xn / self.aion.reshape(
            (-1,) + (1,) * (xn.ndim - 1)), 0.0)

        # weak + strong screening, composition moments once for all links
        from castro_tpu.network import screening as _scrmod

        zeta, ye = _scrmod.plasma_moments(Y, _Z)

        def scr(z1, z2):
            return _scrmod.screen_pair(rho, T9, zeta, ye, z1, z2)

        cf = cno_rates(T9)
        ydot = [jnp.zeros_like(rho) for _ in range(14)]
        enu = jnp.zeros_like(rho)  # mol/s-weighted MeV losses

        def add(changes, rate):
            for i, w in changes:
                ydot[i] = ydot[i] + w * rate

        Yp = Y[IH1]

        # pp chain (as aprox19)
        T913 = T9 ** (1.0 / 3.0)
        lam_pp = 4.01e-15 / T913 ** 2 * jnp.exp(-3.380 / T913) * (
            1.0 + 0.123 * T913 + 1.09 * T913 * T913 + 0.938 * T9)
        r_pp = 0.5 * rho * Yp * Yp * lam_pp * scr(1.0, 1.0)
        add([(IH1, -3.0), (IHE3, 1.0)], r_pp)
        enu = enu + 0.265 * r_pp
        lam_33 = 6.04e10 / T913 ** 2 * jnp.exp(-12.276 / T913) * (
            1.0 + 0.034 * T913 - 0.522 * T913 * T913 - 0.124 * T9 +
            0.353 * T9 ** (4.0 / 3.0) + 0.213 * T9 ** (5.0 / 3.0))
        r_33 = 0.5 * rho * Y[IHE3] * Y[IHE3] * lam_33 * scr(2.0, 2.0)
        add([(IHE3, -2.0), (IHE4, 1.0), (IH1, 2.0)], r_33)

        # proton captures
        caps = [
            ("c12pg", IC12, 6.0, [(IH1, -1.0), (IC12, -1.0), (IN13, 1.0)]),
            ("c13pg", IC13, 6.0, [(IH1, -1.0), (IC13, -1.0), (IN14, 1.0)]),
            ("n13pg", IN13, 7.0, [(IH1, -1.0), (IN13, -1.0), (IO14, 1.0)]),
            ("n14pg", IN14, 7.0, [(IH1, -1.0), (IN14, -1.0), (IO15, 1.0)]),
            ("n15pa", IN15, 7.0, [(IH1, -1.0), (IN15, -1.0), (IC12, 1.0),
                                  (IHE4, 1.0)]),
            ("n15pg", IN15, 7.0, [(IH1, -1.0), (IN15, -1.0), (IO16, 1.0)]),
            ("o16pg", IO16, 8.0, [(IH1, -1.0), (IO16, -1.0), (IF17, 1.0)]),
            ("o17pa", IO17, 8.0, [(IH1, -1.0), (IO17, -1.0), (IN14, 1.0),
                                  (IHE4, 1.0)]),
            ("o17pg", IO17, 8.0, [(IH1, -1.0), (IO17, -1.0), (IF18, 1.0)]),
            ("f18pa", IF18, 9.0, [(IH1, -1.0), (IF18, -1.0), (IO15, 1.0),
                                  (IHE4, 1.0)]),
        ]
        for key, itgt, zt, changes in caps:
            add(changes, rho * Yp * Y[itgt] * cf[key] * scr(1.0, zt))

        # beta+ decays
        add([(IN13, -1.0), (IC13, 1.0)], _LAM_N13 * Y[IN13])
        enu = enu + _ENU_N13 * _LAM_N13 * Y[IN13]
        add([(IO14, -1.0), (IN14, 1.0)], _LAM_O14 * Y[IO14])
        enu = enu + _ENU_O14 * _LAM_O14 * Y[IO14]
        add([(IO15, -1.0), (IN15, 1.0)], _LAM_O15 * Y[IO15])
        enu = enu + _ENU_O15 * _LAM_O15 * Y[IO15]
        add([(IF17, -1.0), (IO17, 1.0)], _LAM_F17 * Y[IF17])
        enu = enu + _ENU_F17 * _LAM_F17 * Y[IF17]

        # 3-alpha (relevant in the hottest zones)
        T8 = 10.0 * T9
        q3a = 7.275 * C.MeV2erg * C.N_A
        lam3a = 5.09e11 * 64.0 / (T8 ** 3) * jnp.exp(-44.027 / T8) * \
            6.0 / q3a * scr(2.0, 2.0) * scr(2.0, 4.0)
        r3a = rho * rho * Y[IHE4] ** 3 / 6.0 * lam3a
        add([(IHE4, -3.0), (IC12, 1.0)], r3a)

        ydot_arr = jnp.stack(ydot)
        sh = (-1,) + (1,) * (xn.ndim - 1)
        xdot = ydot_arr * self.aion.reshape(sh)
        dm = jnp.asarray(_DM_MEV * C.MeV2erg * C.N_A).reshape(sh)
        edot = -jnp.sum(ydot_arr * dm, axis=0) - enu * C.MeV2erg * C.N_A
        if self.include_neutrinos:
            from castro_tpu.network.neutrino import sneut

            ysum = jnp.maximum(jnp.sum(Y, axis=0), 1e-300)
            abar = 1.0 / ysum
            zbar = abar * jnp.sum(Y * self.zion.reshape(sh), axis=0)
            edot = edot - sneut(rho, T, abar, zbar)
        return xdot, edot
