"""subch: the sub-Chandra double-detonation network — the aprox13 alpha
chain extended with the N14/F18/Ne21 admixture links and the
proton-catalyzed C12 bypass that control He-shell detonation ignition
(reference: Microphysics networks/subch, selected by
`Exec/science/subchandra/GNUmakefile` `NETWORK_DIR := subch`; physics
per Shen & Bildsten 2009, ApJ 699, 1365).

Carried nuclei (17): the aprox13 thirteen (He4, C12, O16, Ne20, Mg24,
Si28, S32, Ar36, Ca40, Ti44, Cr48, Fe52, Ni56) plus N14, F18, Ne21 and
the catalytic proton H1.

Extra links beyond aprox13 (whose full machinery — CF88 + Gamow chain
+ detailed-balance reverses + (a,p)(p,g) effective links + Graboske
screening + sneut — is reused on the 13-species slice):

  n14(a,g)f18            CF88
  f18(a,p)ne21           Gamow form (Giesen et al. 1994 scale) —
                         releases the catalytic proton
  c12 + a -> o16 [p]     the c12(p,g)n13(a,p)o16 bypass, collapsed onto
                         its c12(p,g) bottleneck (CF88); n13(a,p) is
                         fast at detonation temperatures and the
                         proton is regenerated (catalytic)

The N14(a,g)F18(a,p)Ne21 sequence seeds protons; the proton-catalyzed
C12(p,g)N13(a,p)O16 bypass then short-circuits the slow C12(a,g)O16
link, advancing He-detonation ignition — the defining subch effect.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from castro_tpu.network.base import Network
from castro_tpu.network.aprox13 import (Aprox13Network, _T9_FLOOR,
                                        _A as _A13, _Z as _Z13,
                                        _B_MEV as _B13)
from castro_tpu.network.nova import cno_rates
from castro_tpu.utils import constants as C

_SPECIES = ("He4", "C12", "O16", "Ne20", "Mg24", "Si28", "S32", "Ar36",
            "Ca40", "Ti44", "Cr48", "Fe52", "Ni56", "N14", "F18",
            "Ne21", "H1")
_A = np.concatenate([_A13, [14.0, 18.0, 21.0, 1.0]])
_Z = np.concatenate([_Z13, [7.0, 9.0, 10.0, 1.0]])
_B_MEV = np.concatenate([_B13, [104.65998, 137.36933, 167.40596, 0.0]])

IN14, IF18, INE21, IH1 = 13, 14, 15, 16
IHE4, IC12, IO16 = 0, 1, 2


class SubchNetwork(Network):
    reactive = True

    def __init__(self, include_neutrinos=True):
        ebin = _B_MEV * C.MeV2erg * C.N_A / _A
        super().__init__(_SPECIES, aion=_A, zion=_Z, ebin=ebin)
        self.include_neutrinos = include_neutrinos
        # alpha-chain machinery without its own sneut (added once here)
        self._a13 = Aprox13Network(include_neutrinos=False)

    def rhs(self, rho, T, xn, e=None):
        T9 = jnp.maximum(T * 1.0e-9, _T9_FLOOR)
        sh = (-1,) + (1,) * (xn.ndim - 1)
        Y = jnp.maximum(xn / self.aion.reshape(sh), 0.0)

        # the full aprox13 chain on the 13-species slice
        xdot13, _ = self._a13.rhs(rho, T, xn[:13])
        ydot = list(xdot13 / self._a13.aion.reshape(
            (-1,) + (1,) * (xn.ndim - 1)))
        ydot += [jnp.zeros_like(rho) for _ in range(4)]

        from castro_tpu.network import screening as _scrmod

        zeta, ye = _scrmod.plasma_moments(Y, _Z)

        def scr(z1, z2):
            return _scrmod.screen_pair(rho, T9, zeta, ye, z1, z2)

        def add(changes, rate):
            for i, w in changes:
                ydot[i] = ydot[i] + w * rate

        T913 = T9 ** (1.0 / 3.0)
        T9m13 = 1.0 / T913
        T9m23 = T9m13 * T9m13
        T9m32 = 1.0 / (T9 * jnp.sqrt(T9))

        # n14(a,g)f18 — CF88
        lam_n14ag = (7.78e9 * T9m23 * jnp.exp(-36.031 * T9m13 -
                                              (T9 / 0.881) ** 2)
                     + 2.36e-10 * T9m32 * jnp.exp(-2.798 / T9)
                     + 2.03 * T9m32 * jnp.exp(-5.054 / T9)
                     + 1.15e4 * T9m23 * jnp.exp(-12.310 / T9))
        add([(IN14, -1.0), (IHE4, -1.0), (IF18, 1.0)],
            rho * Y[IHE4] * Y[IN14] * lam_n14ag * scr(2.0, 7.0))

        # f18(a,p)ne21 — Gamow window at the Giesen et al. (1994) scale;
        # the source of the catalytic protons
        ahat = 4.0 * 18.0 / 22.0
        tau = 4.2487 * (4.0 * 81.0 * ahat / T9) ** (1.0 / 3.0)
        lam_f18ap = 7.83e9 * (18.0 / (ahat * T9 * T9)) ** (1.0 / 3.0) * \
            30.0 * jnp.exp(-tau)
        add([(IF18, -1.0), (IHE4, -1.0), (INE21, 1.0), (IH1, 1.0)],
            rho * Y[IHE4] * Y[IF18] * lam_f18ap * scr(2.0, 9.0))

        # proton-catalyzed bypass c12(p,g)n13(a,p)o16, collapsed onto
        # the CF88 c12(p,g) bottleneck: net c12 + he4 -> o16, H1 catalytic.
        # The N13 intermediate is taken in steady state between its two
        # destruction channels: (a,p) toward O16 (Gamow window, Q=+5.22
        # MeV) and beta+ decay (t1/2 = 9.965 min) which consumes the
        # catalytic proton without producing O16 — so in He-depleted or
        # cool zones the branch (and the bypass) shuts off instead of
        # overrunning.
        lam_c12pg = cno_rates(T9)["c12pg"]
        ahat_n = 4.0 * 13.0 / 17.0
        tau_n = 4.2487 * (4.0 * 49.0 * ahat_n / T9) ** (1.0 / 3.0)
        lam_n13ap = 7.83e9 * (14.0 / (ahat_n * T9 * T9)) ** (1.0 / 3.0) * \
            300.0 * jnp.exp(-tau_n)
        dest_ap = rho * Y[IHE4] * lam_n13ap * scr(2.0, 7.0)
        lam_n13_beta = float(np.log(2.0)) / 597.9
        branch = dest_ap / (dest_ap + lam_n13_beta)
        r_byp = rho * Y[IH1] * Y[IC12] * lam_c12pg * scr(1.0, 6.0) * branch
        add([(IC12, -1.0), (IHE4, -1.0), (IO16, 1.0)], r_byp)

        ydot_arr = jnp.stack(ydot)
        xdot = ydot_arr * self.aion.reshape(sh)
        bion = jnp.asarray(_B_MEV * C.MeV2erg * C.N_A).reshape(sh)
        edot = jnp.sum(ydot_arr * bion, axis=0)
        if self.include_neutrinos:
            from castro_tpu.network.neutrino import sneut

            ysum = jnp.maximum(jnp.sum(Y, axis=0), 1e-300)
            abar = 1.0 / ysum
            zbar = abar * jnp.sum(Y * self.zion.reshape(sh), axis=0)
            edot = edot - sneut(rho, T, abar, zbar)
        return xdot, edot
