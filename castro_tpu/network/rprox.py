"""rprox: 10-isotope approximate rp-process network for mixed H/He
X-ray bursts (reference: Microphysics networks/rprox, selected by
`Exec/science/xrb_mixed/GNUmakefile` `NETWORK_DIR := rprox`; the scheme
is the Wallace & Woosley 1981, ApJS 45, 389 approximation network).

The Microphysics submodule is empty in this checkout, so the network is
rebuilt from the published scheme: fast links inside the hot-CNO cycle
collapse onto their bottlenecks, chains of proton captures + beta
decays between the carried waiting-point nuclei collapse onto the
slowest step.

Carried nuclei (10, the reference roster): C12, O14, O15, O16, F17,
Mg22, S30, Ni56, He4, H1.

Effective links (bottleneck in brackets):
  3 he4 -> c12                      composite 3-alpha
  c12(a,g)o16                       CF88
  c12 + 2p -> o14                   [c12(p,g)n13, CF88]; n13(p,g) fast
  o14 + p -> o15 + e+nu             [o14 beta+, t1/2 = 70.62 s]
  o15 + p -> c12 + he4 + e+nu       [o15 beta+, t1/2 = 122.24 s]
  o16(p,g)f17 <-> f17(g,p)o16       CF88 + detailed balance
  o14(a,p)f17                       CF88
  f17 + 2p -> o15 + he4 + e+nu      [f17(p,g)ne18, WW81 scale] then
                                    ne18(e+nu)f18(p,a)o15
  f17 + 2p -> o15 + he4 + e+nu      [f17 beta+, t1/2 = 64.49 s] then
                                    o17(p,a)n14(p,g)o15
  o15 + a + 3p -> mg22 + e+nu       [o15(a,g)ne19, WW81 scale]
  mg22 + 2a -> s30                  [slowest (a,p) in the chain,
                                    Gamow form on Mg22; WW81 lambda1;
                                    Z-balanced: zero beta+]
  s30 + 6a + 2p -> ni56 + 2 e+nu    [slowest (a,p) in the chain,
                                    Gamow form on S30; WW81 lambda2;
                                    Z: 30 -> 28, two beta+]

CF88 fits come from `nova.cno_rates` / `aprox13._cf88_rates`; the WW81
effective upper-chain links use non-resonant Gamow-window forms with
S-factor scales chosen to reproduce the WW81 burst phenomenology
(breakout near T9 ~ 0.5, alpha-chain flow to Ni56 above T9 ~ 1) —
documented approximation, as in the reference's own "approximate
lambda1/lambda2" treatment.  Energetics from AME mass excesses minus
mean neutrino losses (equipartition of the positron spectrum per weak
link).  Thermal neutrino losses via sneut.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from castro_tpu.network.base import Network
from castro_tpu.network.aprox13 import _cf88_rates, _T9_FLOOR
from castro_tpu.network.nova import cno_rates
from castro_tpu.utils import constants as C

_SPECIES = ("C12", "O14", "O15", "O16", "F17", "Mg22", "S30", "Ni56",
            "He4", "H1")
_A = np.array([12, 14, 15, 16, 17, 22, 30, 56, 4, 1], dtype=float)
_Z = np.array([6, 8, 8, 8, 9, 12, 16, 28, 2, 1], dtype=float)
# AME mass excesses [MeV]
_DM_MEV = np.array([0.0, 8.00736, 2.85560, -4.73700, 1.95170, -0.39700,
                    -14.06300, -53.90000, 2.42492, 7.28897])

(IC12, IO14, IO15, IO16, IF17, IMG22, IS30, INI56, IHE4, IH1) = range(10)

_LN2 = float(np.log(2.0))
_LAM_O14 = _LN2 / 70.62
_LAM_O15 = _LN2 / 122.24
_LAM_F17 = _LN2 / 64.49
# mean nu energy per beta+ [MeV] (equipartition of <Q_e+>, documented)
_ENU_O14 = 0.5 * (8.00736 - 2.86342 - 1.022)
_ENU_O15 = 0.5 * (2.85560 - 0.10144 - 1.022)
_ENU_F17 = 0.5 * (1.95170 + 0.80877 - 1.022)


def _gamow(z1, z2, a1, a2, T9, s_eff):
    ahat = a1 * a2 / (a1 + a2)
    tau = 4.2487 * (z1 * z1 * z2 * z2 * ahat / T9) ** (1.0 / 3.0)
    pref = 7.83e9 * (z1 * z2 / (ahat * T9 * T9)) ** (1.0 / 3.0) * s_eff
    return pref * jnp.exp(-tau)


def rprox_rates(T9):
    """The rprox-specific charged-particle links."""
    T913 = T9 ** (1.0 / 3.0)
    T923 = T913 * T913
    T943 = T9 * T913
    T953 = T9 * T923
    T9m13 = 1.0 / T913
    T9m23 = 1.0 / T923
    T9m32 = 1.0 / (T9 * jnp.sqrt(T9))
    r = {}

    # o14(a,p)f17 — CF88 non-resonant + resonance terms
    r["o14ap"] = (1.68e13 * T9m23 * jnp.exp(-39.388 * T9m13 -
                                            (T9 / 0.717) ** 2) *
                  (1.0 + 0.011 * T913 + 13.117 * T923 + 0.971 * T9 +
                   85.295 * T943 + 16.061 * T953)
                  + 3.31e4 * T9m32 * jnp.exp(-11.733 / T9)
                  + 1.79e7 * T9m32 * jnp.exp(-22.609 / T9))

    # o15(a,g)ne19 — Gamow window at the WW81/Langanke scale
    r["o15ag"] = _gamow(2.0, 8.0, 4.0, 15.0, T9, s_eff=3.0)

    # f17(p,g)ne18 — Gamow window (Wiescher/WW81 scale)
    r["f17pg"] = _gamow(1.0, 9.0, 1.0, 17.0, T9, s_eff=50.0)

    # WW81 effective chain bottlenecks: slowest (a,p) on the carried
    # waiting point
    r["mg22_chain"] = _gamow(2.0, 12.0, 4.0, 22.0, T9, s_eff=30.0)
    r["s30_chain"] = _gamow(2.0, 16.0, 4.0, 30.0, T9, s_eff=30.0)
    return r


class RproxNetwork(Network):
    reactive = True

    def __init__(self, include_neutrinos=True):
        b_mev = _Z * 7.28897 + (_A - _Z) * 8.07132 - _DM_MEV
        ebin = b_mev * C.MeV2erg * C.N_A / _A
        super().__init__(_SPECIES, aion=_A, zion=_Z, ebin=ebin)
        self.include_neutrinos = include_neutrinos

    def rhs(self, rho, T, xn, e=None):
        T9 = jnp.maximum(T * 1.0e-9, _T9_FLOOR)
        Y = jnp.maximum(xn / self.aion.reshape(
            (-1,) + (1,) * (xn.ndim - 1)), 0.0)

        from castro_tpu.network import screening as _scrmod

        zeta, ye = _scrmod.plasma_moments(Y, _Z)

        def scr(z1, z2):
            return _scrmod.screen_pair(rho, T9, zeta, ye, z1, z2)

        cno = cno_rates(T9)
        cf = _cf88_rates(T9)
        rp = rprox_rates(T9)
        ydot = [jnp.zeros_like(rho) for _ in range(10)]
        enu = jnp.zeros_like(rho)

        def add(changes, rate):
            for i, w in changes:
                ydot[i] = ydot[i] + w * rate

        Yp, Ya = Y[IH1], Y[IHE4]

        # helium burning
        T8 = 10.0 * T9
        q3a = 7.275 * C.MeV2erg * C.N_A
        lam3a = 5.09e11 * 64.0 / (T8 ** 3) * jnp.exp(-44.027 / T8) * \
            6.0 / q3a * scr(2.0, 2.0) * scr(2.0, 4.0)
        add([(IHE4, -3.0), (IC12, 1.0)],
            rho * rho * Ya ** 3 / 6.0 * lam3a)
        add([(IHE4, -1.0), (IC12, -1.0), (IO16, 1.0)],
            rho * Ya * Y[IC12] * cf["c12ag"] * scr(2.0, 6.0))

        # hot CNO (beta-limited)
        add([(IH1, -2.0), (IC12, -1.0), (IO14, 1.0)],
            rho * Yp * Y[IC12] * cno["c12pg"] * scr(1.0, 6.0))
        r_o14b = _LAM_O14 * Y[IO14]
        add([(IO14, -1.0), (IH1, -1.0), (IO15, 1.0)], r_o14b)
        enu = enu + _ENU_O14 * r_o14b
        r_o15b = _LAM_O15 * Y[IO15]
        add([(IO15, -1.0), (IH1, -1.0), (IC12, 1.0), (IHE4, 1.0)], r_o15b)
        enu = enu + _ENU_O15 * r_o15b

        # o16 <-> f17
        lam_opg = cno["o16pg"] * scr(1.0, 8.0)
        fwd = rho * Yp * Y[IO16] * lam_opg
        q_f17 = 0.600  # p separation energy of F17 [MeV]
        # detailed balance including the spin/partition factor
        # g_p g_O16 / g_F17 = 2*1/6 = 1/3 (F17 g.s. is 5/2+): the reverse
        # coefficient is ~3.04e9, not the bare 9.8685e9 kinematic factor
        rev = (1.0 / 3.0) * 9.8685e9 * T9 ** 1.5 * (16.0 / 17.0) ** 1.5 * \
            jnp.exp(jnp.maximum(-q_f17 * 11.6045 / T9, -200.0)) * \
            lam_opg * Y[IF17]
        add([(IH1, -1.0), (IO16, -1.0), (IF17, 1.0)], fwd - rev)

        # breakout
        add([(IO14, -1.0), (IHE4, -1.0), (IH1, 1.0), (IF17, 1.0)],
            rho * Ya * Y[IO14] * rp["o14ap"] * scr(2.0, 8.0))
        r_f17pg = rho * Yp * Y[IF17] * rp["f17pg"] * scr(1.0, 9.0)
        add([(IF17, -1.0), (IH1, -2.0), (IO15, 1.0), (IHE4, 1.0)], r_f17pg)
        enu = enu + 0.5 * r_f17pg  # ne18 beta in the collapsed chain
        r_f17b = _LAM_F17 * Y[IF17]
        add([(IF17, -1.0), (IH1, -2.0), (IO15, 1.0), (IHE4, 1.0)], r_f17b)
        enu = enu + _ENU_F17 * r_f17b
        r_brk = rho * Ya * Y[IO15] * rp["o15ag"] * scr(2.0, 8.0)
        add([(IO15, -1.0), (IHE4, -1.0), (IH1, -3.0), (IMG22, 1.0)], r_brk)
        enu = enu + 1.0 * r_brk

        # upper chain to ni56 (WW81 lambda1/lambda2 bottlenecks).
        # beta+ counts follow the net charge change of each collapsed
        # link: mg22 + 2a -> s30 is exactly Z-balanced (12+4 = 16, zero
        # betas, no nu loss); s30 + 6a + 2p -> ni56 requires exactly 2
        # beta+ (Z: 16+12+2 = 30 -> 28), ~1 MeV mean nu energy each.
        r1 = rho * Ya * Y[IMG22] * rp["mg22_chain"] * scr(2.0, 12.0)
        add([(IMG22, -1.0), (IHE4, -2.0), (IS30, 1.0)], r1)
        r2 = rho * Ya * Y[IS30] * rp["s30_chain"] * scr(2.0, 16.0)
        add([(IS30, -1.0), (IHE4, -6.0), (IH1, -2.0), (INI56, 1.0)], r2)
        enu = enu + 2.0 * r2

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
