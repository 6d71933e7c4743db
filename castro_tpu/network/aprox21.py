"""aprox21: the 21-isotope extension of aprox19 with Cr56 and Fe56,
allowing the electron fraction to fall below the Fe54 floor (Ye down to
24/56 = 0.4286) in silicon burning / pre-collapse conditions.

Reference: Microphysics networks/aprox21 (`NETWORK_DIR := aprox21`,
selected by `Exec/science/*/GNUmakefile` for low-Ye massive-star runs;
the Microphysics submodule is empty in this checkout). Species = the 19
of aprox19 + Cr56 + Fe56. The added flows, from their published physical
content:

- fe54 + 2n <-> fe56       : the fe54(n,g)fe55(n,g)fe56 capture chain
                             collapsed onto the first capture with a
                             thermal s-wave effective <sigma v> (iron-
                             group MACS scale, ~1e6 cm^3/mol/s; neutron
                             captures are fast wherever free neutrons
                             exist, so the equilibrium set by the
                             2-step detailed-balance reverse is what
                             matters dynamically)
- fe56 + 2 e- -> cr56 + 2nu: the Ye-lowering double electron capture
                             (Z: 26 -> 24 at A = 56), with a simplified
                             FFN-class parametrization of the e-capture
                             rate rising steeply with rho*Ye and T —
                             documented stand-in for the tabulated weak
                             rates; exact Q from AME mass excesses, and
                             the neutrino loss per capture taken as the
                             capture Q share (~60%, FFN systematics)
- cr56 beta- decay back    : t1/2 = 5.94 min ground-state beta- toward
                             mn56 -> fe56 (collapsed; matters only at low
                             density where captures shut off)

Everything else (pp/CNO, alpha chain, fe54 <-> ni56) is inherited from
aprox19 unchanged. Deep-photodisintegration conditions hand off to the
NSE solver (`network/nse.py`) exactly as aprox19 does in the reference.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from castro_tpu.network.aprox19 import (Aprox19Network, _A as _A19,
                                        _Z as _Z19, _B_MEV as _B19,
                                        _DM_MEV as _DM19, _SPECIES as _S19,
                                        IFE54, INEUT)
from castro_tpu.network.base import Network
from castro_tpu.utils import constants as C

_SPECIES = _S19 + ("Cr56", "Fe56")
_A = np.concatenate([_A19, [56.0, 56.0]])
_Z = np.concatenate([_Z19, [24.0, 26.0]])
# AME total binding energies / mass excesses (MeV)
_B_MEV = np.concatenate([_B19, [488.499, 492.254]])
_DM_MEV = np.concatenate([_DM19, [-55.281, -60.601]])

ICR56 = 19
IFE56 = 20
_LN2 = float(np.log(2.0))


class Aprox21Network(Network):
    reactive = True

    def __init__(self, include_neutrinos=True):
        ebin = _B_MEV * C.MeV2erg * C.N_A / _A
        super().__init__(_SPECIES, aion=_A, zion=_Z, ebin=ebin)
        self.include_neutrinos = include_neutrinos
        # delegate the 19-species flows to aprox19's rhs
        self._a19 = Aprox19Network(include_neutrinos=False)

    def rhs(self, rho, T, xn, e=None):
        T9 = jnp.maximum(T * 1.0e-9, 1e-3)
        sh = (-1,) + (1,) * (xn.ndim - 1)
        Y = jnp.maximum(xn / self.aion.reshape(sh), 0.0)

        # aprox19 flows on the first 19 species (its screening zeta
        # misses the tiny Cr56/Fe56 contribution — a <1% effect on H12)
        xdot19, edot19 = self._a19.rhs(rho, T, xn[:19], e=e)

        ydot = [jnp.zeros_like(rho) for _ in range(21)]
        enu = jnp.zeros_like(rho)

        def add(idx_changes, rate):
            for i, w in idx_changes:
                ydot[i] = ydot[i] + w * rate

        # fe54 + 2n <-> fe56 (fe55 in steady state; forward bottleneck =
        # first capture, thermal s-wave effective rate)
        lam_ng = 1.0e6  # cm^3/mol/s, iron-group MACS scale (stand-in)
        q_2n = float(_B_MEV[IFE56] - _B_MEV[IFE54])  # B_n = 0 in this table
        fwd = rho * rho * Y[INEUT] ** 2 * Y[IFE54] * lam_ng
        # two-step detailed balance: (kinematic factor)^2 exp(-Q/kT)
        rev = (9.8685e9 * T9 ** 1.5) ** 2 * (54.0 / 56.0) ** 1.5 * \
            jnp.exp(jnp.maximum(-q_2n * 11.6045 / T9, -200.0)) * \
            lam_ng * Y[IFE56]
        add([(INEUT, -2.0), (IFE54, -1.0), (IFE56, 1.0)], fwd - rev)

        # fe56 + 2e- -> cr56 + 2nu (FFN-class parametrization: steeply
        # rising with rho*Ye and T; stand-in for the tabulated weak rates)
        ye = jnp.sum(Y * self.zion.reshape(sh), axis=0)
        rho_ye7 = jnp.maximum(rho * ye, 1.0) / 1.0e7
        lam_ec = 1.0e-9 * rho_ye7 ** 2 * jnp.exp(
            jnp.clip(2.0 * (T9 - 3.0), -50.0, 50.0))
        r_ec = Y[IFE56] * lam_ec
        add([(IFE56, -1.0), (ICR56, 1.0)], r_ec)
        q_ec = float(_DM_MEV[IFE56] - _DM_MEV[ICR56])  # < 0: endothermic
        enu = enu + 0.6 * abs(q_ec) * r_ec  # FFN ~60% loss share

        # cr56 beta- (t1/2 = 5.94 min) back toward fe56 (mn56 collapsed)
        lam_b = _LN2 / 356.4
        r_b = Y[ICR56] * lam_b
        add([(ICR56, -1.0), (IFE56, 1.0)], r_b)
        enu = enu + 1.0 * r_b  # ~1 MeV mean nu per beta chain

        ydot_arr = jnp.stack(ydot)
        xdot_new = ydot_arr * self.aion.reshape(sh)
        dm = jnp.asarray(_DM_MEV * C.MeV2erg * C.N_A).reshape(sh)
        edot_new = -jnp.sum(ydot_arr * dm, axis=0) - enu * C.MeV2erg * C.N_A

        xdot = jnp.concatenate(
            [xdot19, jnp.zeros((2,) + rho.shape, xdot19.dtype)], axis=0) \
            + xdot_new
        edot = edot19 + edot_new
        if self.include_neutrinos:
            from castro_tpu.network.neutrino import sneut

            ysum = jnp.maximum(jnp.sum(Y, axis=0), 1e-300)
            abar = 1.0 / ysum
            zbar = abar * jnp.sum(Y * self.zion.reshape(sh), axis=0)
            edot = edot - sneut(rho, T, abar, zbar)
        return xdot, edot
