"""iso7: 7-isotope alpha network (He4, C12, O16, Ne20, Mg24, Si28, Ni56).

Reference: Microphysics networks/iso7 (Timmes' iso7, a contraction of
approx13 for fast He/C/O/Si burning), selected by science problems like
subch / Detonation variants (`NETWORK_DIR := iso7`); burned via
`burner()` from `Source/reactions/Castro_react.cpp:123`.

The Microphysics submodule is empty in this checkout, so rates come from
their published sources (see `aprox13.py` for the provenance of the
shared CF88 fits, Gamow forms, detailed-balance reverses, and Graboske
weak screening).  iso7-specific structure:

- the alpha chain runs only to Si28; everything above is collapsed into
  one effective QSE link  si28 + 7 he4 <-> ni56 .  The forward rate is
  bottlenecked by the first capture si28(a,g) (the chain above Si is in
  quasi-equilibrium at the temperatures where this link matters); the
  reverse is the photodisintegration bottleneck ni56(g,a) by detailed
  balance on the last capture fe52(a,g)ni56.  This is the same
  closure idea as Timmes' rsi2ni/rni2si effective pair, implemented with
  this package's rate forms instead of the tabulated fits.
- energy generation is exact given the abundance changes (binding-energy
  dot product), so the per-link Q-values are not approximated.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from castro_tpu.network.base import Network
from castro_tpu.network.aprox13 import (_cf88_rates, _gamow_ag, _T9_FLOOR,
                                        _A as _A13, _Z as _Z13,
                                        _B_MEV as _B13)
from castro_tpu.utils import constants as C

_SPECIES = ("He4", "C12", "O16", "Ne20", "Mg24", "Si28", "Ni56")
# indices into the aprox13 metadata tables
_MAP13 = np.array([0, 1, 2, 3, 4, 5, 12])
_A = _A13[_MAP13]
_Z = _Z13[_MAP13]
_B_MEV = _B13[_MAP13]

IHE4, IC12, IO16, INE20, IMG24, ISI28, INI56 = range(7)


def _rev_fac(q_mev, a1, a2, a12, T9):
    """Detailed-balance reverse factor for a 2-body capture (see
    aprox13.rev_fac)."""
    afac = (a1 * a2 / a12) ** 1.5
    return 9.8685e9 * T9 ** 1.5 * afac * jnp.exp(
        jnp.maximum(-q_mev * 11.6045 / T9, -200.0))


class Iso7Network(Network):
    reactive = True

    def __init__(self, include_neutrinos=True):
        ebin = _B_MEV * C.MeV2erg * C.N_A / _A
        super().__init__(_SPECIES, aion=_A, zion=_Z, ebin=ebin)
        self.include_neutrinos = include_neutrinos

    def _screen_weak(self, rho, T9, Y, z1, z2):
        """Weak + strong screening (same as aprox13; screening.py)."""
        from castro_tpu.network import screening

        zeta, ye = screening.plasma_moments(Y, _Z)
        return screening.screen_pair(rho, jnp.maximum(T9, _T9_FLOOR),
                                     zeta, ye, z1, z2)

    def rhs(self, rho, T, xn, e=None):
        T9 = jnp.maximum(T * 1.0e-9, _T9_FLOOR)
        Y = xn / self.aion.reshape((-1,) + (1,) * (xn.ndim - 1))
        Y = jnp.maximum(Y, 0.0)

        cf = _cf88_rates(T9)
        ydot = [jnp.zeros_like(rho) for _ in range(7)]

        def add(idx_changes, rate):
            for i, w in idx_changes:
                ydot[i] = ydot[i] + w * rate

        # triple-alpha <-> c12 (identical closure to aprox13)
        scr3a = self._screen_weak(rho, T9, Y, 2.0, 2.0) * \
            self._screen_weak(rho, T9, Y, 2.0, 4.0)
        T8 = 10.0 * T9
        q3a_erg_per_mol = 7.275 * C.MeV2erg * C.N_A
        lam3a_T = 5.09e11 * 64.0 / (T8 ** 3) * jnp.exp(-44.027 / T8) * \
            6.0 / q3a_erg_per_mol
        r3a = rho * rho * Y[IHE4] ** 3 / 6.0 * lam3a_T * scr3a
        rg3a = lam3a_T / 6.0 * 2.00e20 * T9 ** 3 * jnp.exp(
            jnp.maximum(-84.424 / T9, -200.0)) * Y[IC12]
        add([(IHE4, -3.0), (IC12, 1.0)], r3a - rg3a)

        # heavy-ion fusions
        scr_cc = self._screen_weak(rho, T9, Y, 6.0, 6.0)
        rcc = 0.5 * rho * Y[IC12] * Y[IC12] * cf["c12c12"] * scr_cc
        add([(IC12, -2.0), (INE20, 1.0), (IHE4, 1.0)], rcc)

        scr_co = self._screen_weak(rho, T9, Y, 6.0, 8.0)
        rco = rho * Y[IC12] * Y[IO16] * cf["c12o16"] * scr_co
        add([(IC12, -1.0), (IO16, -1.0), (IMG24, 1.0), (IHE4, 1.0)], rco)

        scr_oo = self._screen_weak(rho, T9, Y, 8.0, 8.0)
        roo = 0.5 * rho * Y[IO16] * Y[IO16] * cf["o16o16"] * scr_oo
        add([(IO16, -2.0), (ISI28, 1.0), (IHE4, 1.0)], roo)

        # (a,g) chain he4..si28 + reverse photodisintegrations
        chain = [(IC12, IO16, cf["c12ag"]),
                 (IO16, INE20, cf["o16ag"]),
                 (INE20, IMG24, cf["ne20ag"]),
                 (IMG24, ISI28, cf["mg24ag"])]
        for k, kp1, lam0 in chain:
            scr = self._screen_weak(rho, T9, Y, 2.0, _Z[k])
            lam = lam0 * scr
            q = _B_MEV[kp1] - _B_MEV[k] - _B_MEV[IHE4]
            fwd = rho * Y[IHE4] * Y[k] * lam
            rev = _rev_fac(q, 4.0, _A[k], _A[kp1], T9) * lam * Y[kp1]
            add([(IHE4, -1.0), (k, -1.0), (kp1, 1.0)], fwd - rev)

        # effective QSE link si28 + 7 he4 <-> ni56:
        # forward bottleneck = si28(a,g); reverse bottleneck =
        # ni56(g,a)fe52 by detailed balance on fe52(a,g)ni56.
        lam_si = _gamow_ag(5, T9) * self._screen_weak(rho, T9, Y, 2.0,
                                                      _Z[ISI28])
        r_fwd = rho * Y[IHE4] * Y[ISI28] * lam_si
        lam_fe = _gamow_ag(11, T9)
        q_fe_ni = float(_B13[12] - _B13[11] - _B13[0])
        r_rev = _rev_fac(q_fe_ni, 4.0, 52.0, 56.0, T9) * lam_fe * Y[INI56]
        net = r_fwd - r_rev
        add([(IHE4, -7.0), (ISI28, -1.0), (INI56, 1.0)], net)

        ydot_arr = jnp.stack(ydot)
        xdot = ydot_arr * self.aion.reshape((-1,) + (1,) * (xn.ndim - 1))
        bion = jnp.asarray(_B_MEV * C.MeV2erg * C.N_A).reshape(
            (-1,) + (1,) * (xn.ndim - 1))
        edot = jnp.sum(ydot_arr * bion, axis=0)
        if self.include_neutrinos:
            from castro_tpu.network.neutrino import sneut

            ysum = jnp.maximum(jnp.sum(jnp.stack(
                [Y[k] for k in range(7)]), axis=0), 1e-300)
            abar = 1.0 / ysum
            zbar = abar * jnp.sum(jnp.stack(
                [_Z[k] * Y[k] for k in range(7)]), axis=0)
            edot = edot - sneut(rho, T, abar, zbar)
        return xdot, edot
