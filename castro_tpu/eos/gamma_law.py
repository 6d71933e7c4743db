"""Ideal-gamma-law EOS (reference: Microphysics eos/gamma_law).

p = rho e (gamma-1) = rho k T / (mu m_u);  all inversions are analytic.
Used by 32 of the reference's problem setups (SURVEY.md L0b).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from castro_tpu.eos.base import Eos, EosState
from castro_tpu.utils import constants as C


class GammaLawEos(Eos):
    pallas_safe = True

    def __init__(self, gamma: float = 5.0 / 3.0, network=None, assume_neutral: bool = True):
        self.gamma = float(gamma)
        self.network = network
        self.assume_neutral = bool(assume_neutral)

    def _az(self):
        """Species A/Z as host floats — the species sums below unroll with
        scalar literals so this EOS stays evaluable inside Pallas kernels
        (closing over array constants is disallowed there)."""
        import numpy as np

        a = [float(x) for x in np.asarray(self.network.aion)]
        z = [float(x) for x in np.asarray(self.network.zion)]
        return a, z

    def mu_from_xn(self, xn: Optional[jnp.ndarray]):
        if xn is None or self.network is None:
            return 1.0
        a, z = self._az()
        inv_mu = 0.0
        for i in range(len(a)):
            if self.assume_neutral:
                inv_mu = inv_mu + xn[i] / a[i]
            else:
                inv_mu = inv_mu + xn[i] * (1.0 + z[i]) / a[i]
        return 1.0 / inv_mu

    def _abar_zbar(self, xn):
        if xn is None or self.network is None:
            one = jnp.asarray(1.0)
            return one, one
        a, z = self._az()
        inv_abar = 0.0
        zsum = 0.0
        for i in range(len(a)):
            inv_abar = inv_abar + xn[i] / a[i]
            zsum = zsum + xn[i] * z[i] / a[i]
        abar = 1.0 / inv_abar
        zbar = abar * zsum
        return abar, zbar

    # k_B/m_u folded at f64 host precision: dividing by (mu*m_u) ~ 1e-24
    # on-device makes the autodiff JVP divide by its square ~ 1e-47,
    # which underflows float32 and NaNs the burner Jacobian
    _KB_OVER_MU = float(C.k_B) / float(C.m_u)

    def _fill(self, rho, T, xn):
        g = self.gamma
        mu = self.mu_from_xn(xn)
        abar, zbar = self._abar_zbar(xn)
        cv = self._KB_OVER_MU / (mu * (g - 1.0))
        e = cv * T
        p = rho * e * (g - 1.0)
        h = e + p / rho
        cs = jnp.sqrt(g * p / rho)
        rho_a = jnp.asarray(rho)
        return EosState(
            rho=rho_a,
            T=jnp.asarray(T),
            p=p,
            e=e,
            h=h,
            gam1=jnp.full_like(p, g),
            cs=cs,
            dpdr_e=e * (g - 1.0),
            dpde=rho_a * (g - 1.0),
            dpdT=rho_a * cv * (g - 1.0),
            dedT=jnp.broadcast_to(jnp.asarray(cv), jnp.shape(e)),
            cv=jnp.broadcast_to(jnp.asarray(cv), jnp.shape(e)),
            cp=jnp.broadcast_to(jnp.asarray(cv * g), jnp.shape(e)),
            mu=jnp.broadcast_to(jnp.asarray(mu), jnp.shape(e)),
            abar=jnp.broadcast_to(abar, jnp.shape(e)),
            zbar=jnp.broadcast_to(zbar, jnp.shape(e)),
        )

    # -- modes -------------------------------------------------------------
    def rt(self, rho, T, xn=None) -> EosState:
        return self._fill(rho, T, xn)

    def re(self, rho, e, xn=None) -> EosState:
        g = self.gamma
        mu = self.mu_from_xn(xn)
        cv = self._KB_OVER_MU / (mu * (g - 1.0))
        T = e / cv
        return self._fill(rho, T, xn)

    def rp(self, rho, p, xn=None) -> EosState:
        g = self.gamma
        e = p / (rho * (g - 1.0))
        return self.re(rho, e, xn)

    def rh(self, rho, h, xn=None) -> EosState:
        g = self.gamma
        e = h / g
        return self.re(rho, e, xn)

    def tp(self, T, p, xn=None) -> EosState:
        g = self.gamma
        mu = self.mu_from_xn(xn)
        rho = p * mu * C.m_u / (C.k_B * T)
        return self._fill(rho, T, xn)

    def ph(self, p, h, xn=None) -> EosState:
        g = self.gamma
        e = h / g
        rho = p / (e * (g - 1.0))
        return self.re(rho, e, xn)
