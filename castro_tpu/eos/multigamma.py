"""Multigamma EOS: per-species gamma ideal gases (reference:
Microphysics eos/multigamma)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from castro_tpu.eos.base import Eos, EosState
from castro_tpu.eos.gamma_law import GammaLawEos
from castro_tpu.utils import constants as C


class MultigammaEos(GammaLawEos):
    def __init__(self, gammas, network):
        super().__init__(gamma=float(np.mean(np.asarray(gammas))), network=network)
        self.gammas = jnp.asarray(gammas)

    def _gamma_eff(self, xn):
        """Effective gamma: cv-weighted mixture."""
        a = self.network.aion.reshape((-1,) + (1,) * (xn.ndim - 1))
        g = self.gammas.reshape((-1,) + (1,) * (xn.ndim - 1))
        cv_k = (float(C.k_B) / float(C.m_u)) / (a * (g - 1.0))
        cv = jnp.sum(xn * cv_k, axis=0)
        # p = sum_k rho X_k kT/(A_k m_u) ; e = cv T  => gamma_eff = 1 + R_mix/cv
        R_mix = jnp.sum(xn * (float(C.k_B) / float(C.m_u)) / a, axis=0)
        return 1.0 + R_mix / cv

    def rt(self, rho, T, xn=None) -> EosState:
        if xn is None:
            return super().rt(rho, T, xn)
        g = self._gamma_eff(xn)
        mu = self.mu_from_xn(xn)
        cv = (float(C.k_B) / float(C.m_u)) / (mu * (g - 1.0))
        e = cv * T
        p = rho * e * (g - 1.0)
        abar, zbar = self._abar_zbar(xn)
        rho_a = jnp.asarray(rho)
        return EosState(
            rho=rho_a, T=jnp.asarray(T), p=p, e=e, h=e + p / rho,
            gam1=g, cs=jnp.sqrt(g * p / rho), dpdr_e=e * (g - 1.0),
            dpde=rho_a * (g - 1.0), dpdT=rho_a * cv * (g - 1.0),
            dedT=jnp.broadcast_to(cv, jnp.shape(e)), cv=jnp.broadcast_to(cv, jnp.shape(e)),
            cp=jnp.broadcast_to(cv * g, jnp.shape(e)),
            mu=jnp.broadcast_to(mu, jnp.shape(e)),
            abar=jnp.broadcast_to(abar, jnp.shape(e)), zbar=jnp.broadcast_to(zbar, jnp.shape(e)),
        )

    def re(self, rho, e, xn=None) -> EosState:
        if xn is None:
            return super().re(rho, e, xn)
        g = self._gamma_eff(xn)
        mu = self.mu_from_xn(xn)
        cv = (float(C.k_B) / float(C.m_u)) / (mu * (g - 1.0))
        return self.rt(rho, e / cv, xn)

    def rp(self, rho, p, xn=None) -> EosState:
        if xn is None:
            return super().rp(rho, p, xn)
        g = self._gamma_eff(xn)
        return self.re(rho, p / (rho * (g - 1.0)), xn)
