"""Polytropic EOS: p = K rho^gamma (reference: Microphysics eos/polytrope).

The internal energy follows the gamma-law relation e = p/(rho (gamma-1)),
and temperature is carried through a gamma-law ideal-gas relation so thermal
quantities stay defined (matching the reference's behavior).
"""

from __future__ import annotations

import jax.numpy as jnp

from castro_tpu.eos.base import EosState
from castro_tpu.eos.gamma_law import GammaLawEos
from castro_tpu.utils import constants as C


class PolytropeEos(GammaLawEos):
    def __init__(self, K=1.0, gamma=5.0 / 3.0, mu_e=2.0, polytrope_type=0, network=None):
        # polytrope_type 1: non-relativistic degenerate e-; 2: relativistic
        if polytrope_type == 1:
            gamma = 5.0 / 3.0
            K = 9.9154e12 / mu_e ** (5.0 / 3.0)
        elif polytrope_type == 2:
            gamma = 4.0 / 3.0
            K = 1.2316e15 / mu_e ** (4.0 / 3.0)
        super().__init__(gamma=gamma, network=network)
        self.K = float(K)

    def _fill_poly(self, rho, xn):
        g = self.gamma
        p = self.K * rho ** g
        e = p / (rho * (g - 1.0))
        mu = self.mu_from_xn(xn)
        cv = (float(C.k_B) / float(C.m_u)) / (mu * (g - 1.0))
        T = e / cv
        st = super()._fill(rho, T, xn)
        return st

    def rt(self, rho, T, xn=None) -> EosState:
        # barotropic: ignores T input (reference behavior)
        return self._fill_poly(rho, xn)

    def re(self, rho, e, xn=None) -> EosState:
        return self._fill_poly(rho, xn)

    def rp(self, rho, p, xn=None) -> EosState:
        return self._fill_poly(rho, xn)

    def tp(self, T, p, xn=None) -> EosState:
        rho = (p / self.K) ** (1.0 / self.gamma)
        return self._fill_poly(rho, xn)

    def rh(self, rho, h, xn=None) -> EosState:
        # h = gamma K rho^(gamma-1)/(gamma-1)  =>  invert for rho
        g = self.gamma
        rho_h = ((g - 1.0) * h / (g * self.K)) ** (1.0 / (g - 1.0))
        return self._fill_poly(rho_h, xn)
