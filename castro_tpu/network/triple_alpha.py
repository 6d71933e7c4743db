"""triple_alpha_plus_cago: He4 + C12 + O16 (+ inert Fe56) with the
3-alpha reaction and C12(a,g)O16 (reference: Microphysics
networks/triple_alpha_plus_cago, selected by
`Exec/reacting_tests/{bubble_convergence,reacting_convergence}/GNUmakefile`).

Rates reuse the aprox13 implementations: the classic composite 3-alpha
fit with its 3-body Saha reverse and the CF88 C12(a,g)O16 fit with the
2-body detailed-balance reverse, both Graboske weak-screened."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from castro_tpu.network.base import Network
from castro_tpu.network.aprox13 import _cf88_rates, _T9_FLOOR
from castro_tpu.utils import constants as C

_SPECIES = ("He4", "C12", "O16", "Fe56")
_A = np.array([4.0, 12.0, 16.0, 56.0])
_Z = np.array([2.0, 6.0, 8.0, 26.0])
# binding energies [MeV] (same table as aprox13/aprox19)
_B_MEV = np.array([28.29603, 92.16294, 127.62093, 492.25389])
_Q_C12AG = 7.16192  # MeV


class TripleAlphaCagoNetwork(Network):
    reactive = True

    def __init__(self, include_neutrinos=True):
        ebin = _B_MEV * C.MeV2erg * C.N_A / _A
        super().__init__(_SPECIES, aion=_A, zion=_Z, ebin=ebin)
        self.include_neutrinos = include_neutrinos

    def _screen_weak(self, rho, T9, Y, z1, z2):
        """Weak + strong screening (as aprox13; screening.py)."""
        from castro_tpu.network import screening

        zeta, ye = screening.plasma_moments(Y, _Z)
        return screening.screen_pair(rho, jnp.maximum(T9, _T9_FLOOR),
                                     zeta, ye, z1, z2)

    def rhs(self, rho, T, xn, e=None):
        T9 = jnp.maximum(T * 1.0e-9, _T9_FLOOR)
        Y = xn / self.aion.reshape((-1,) + (1,) * (xn.ndim - 1))
        Y = jnp.maximum(Y, 0.0)
        cf = _cf88_rates(T9)
        ydot = [jnp.zeros_like(rho) for _ in range(4)]

        # triple-alpha (identical to aprox13.rhs)
        scr3a = self._screen_weak(rho, T9, Y, 2.0, 2.0) * \
            self._screen_weak(rho, T9, Y, 2.0, 4.0)
        T8 = 10.0 * T9
        q3a_erg_per_mol = 7.275 * C.MeV2erg * C.N_A
        lam3a_T = 5.09e11 * 64.0 / (T8 ** 3) * jnp.exp(-44.027 / T8) * \
            6.0 / q3a_erg_per_mol
        r3a = rho * rho * Y[0] ** 3 / 6.0 * lam3a_T * scr3a
        rg3a = lam3a_T / 6.0 * 2.00e20 * T9 ** 3 * jnp.exp(
            jnp.maximum(-84.424 / T9, -200.0)) * Y[1]
        net3a = r3a - rg3a
        ydot[0] = ydot[0] - 3.0 * net3a
        ydot[1] = ydot[1] + net3a

        # C12(a,g)O16 with detailed-balance reverse
        scr = self._screen_weak(rho, T9, Y, 2.0, 6.0)
        lam = cf["c12ag"] * scr
        afac = (_A[0] * _A[1] / _A[2]) ** 1.5
        rev = 9.8685e9 * T9 ** 1.5 * afac * jnp.exp(
            jnp.maximum(-_Q_C12AG * 11.6045 / T9, -200.0)) * lam * Y[2]
        net_ag = rho * Y[0] * Y[1] * lam - rev
        ydot[0] = ydot[0] - net_ag
        ydot[1] = ydot[1] - net_ag
        ydot[2] = ydot[2] + net_ag

        ydot_a = jnp.stack(ydot)
        sh = (-1,) + (1,) * (xn.ndim - 1)
        xdot = ydot_a * self.aion.reshape(sh)
        bion = jnp.asarray(_B_MEV * C.MeV2erg * C.N_A).reshape(sh)
        edot = jnp.sum(ydot_a * bion, axis=0)
        if self.include_neutrinos:
            from castro_tpu.network.neutrino import sneut

            abar = 1.0 / jnp.maximum(jnp.sum(Y, axis=0), 1e-300)
            zbar = jnp.sum(Y * self.zion.reshape(sh), axis=0) * abar
            edot = edot - sneut(rho, T, abar, zbar)
        return xdot, edot
