"""rad_power_law EOS: gamma-law pressure with a power-law specific heat,
c_v = const_c_v * rho^m * T^(-n) (reference: Microphysics eos/rad_power_law,
used by 5 radiation test problems, SURVEY.md L0b)."""

from __future__ import annotations

import jax.numpy as jnp

from castro_tpu.eos.base import EosState
from castro_tpu.eos.gamma_law import GammaLawEos


class RadPowerLawEos(GammaLawEos):
    def __init__(self, gamma=5.0 / 3.0, const_c_v=1.0, c_v_exp_m=0.0, c_v_exp_n=0.0,
                 network=None):
        super().__init__(gamma=gamma, network=network)
        self.const_c_v = float(const_c_v)
        self.m = float(c_v_exp_m)
        self.n = float(c_v_exp_n)

    def _cv(self, rho, T):
        return self.const_c_v * rho ** self.m * T ** (-self.n)

    def _fill_rpl(self, rho, T, xn):
        g = self.gamma
        cv = self._cv(rho, T)
        # e = integral cv dT = cv*T/(1-n) for n != 1
        e = cv * T / (1.0 - self.n)
        p = rho * e * (g - 1.0)
        rho_a = jnp.asarray(rho)
        ones = jnp.ones_like(p)
        return EosState(
            rho=rho_a, T=jnp.asarray(T), p=p, e=e, h=e + p / rho,
            gam1=jnp.full_like(p, g), cs=jnp.sqrt(g * p / rho),
            dpdr_e=e * (g - 1.0), dpde=rho_a * (g - 1.0),
            dpdT=rho_a * (g - 1.0) * cv, dedT=cv, cv=cv, cp=cv * g,
            mu=ones, abar=ones, zbar=ones,
        )

    def rt(self, rho, T, xn=None) -> EosState:
        return self._fill_rpl(rho, T, xn)

    def re(self, rho, e, xn=None) -> EosState:
        # invert e = const_c_v rho^m T^(1-n)/(1-n)
        T = (e * (1.0 - self.n) / (self.const_c_v * rho ** self.m)) ** (1.0 / (1.0 - self.n))
        return self._fill_rpl(rho, T, xn)

    def rp(self, rho, p, xn=None) -> EosState:
        e = p / (rho * (self.gamma - 1.0))
        return self.re(rho, e, xn)
