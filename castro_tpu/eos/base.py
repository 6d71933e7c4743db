"""EOS interface: functional, vectorized, mode-dispatched statically.

The reference calls `eos(eos_input_rt, eos_state)` etc. from ~20 files
(Microphysics interface, see `Source/driver/Castro.H:47-51`). Here each input
mode is a method returning a fresh `EosState` pytree of arrays; the mode is a
*Python-level* (static) choice so jit traces only the branch in use.

Species mass fractions `xn` are component-major: `xn[nspec, *grid]`.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class EosState(NamedTuple):
    """Thermodynamic state bundle (all entries broadcast-compatible arrays).

    Mirrors Microphysics `eos_t`: rho,T,p,e,h plus derivatives used by the
    hydro (gam1, cs, dpdr_e, dpde) and the burners (cv, cp, abar, zbar).
    """

    rho: jnp.ndarray
    T: jnp.ndarray
    p: jnp.ndarray
    e: jnp.ndarray
    h: jnp.ndarray
    gam1: jnp.ndarray  # first adiabatic index Gamma_1
    cs: jnp.ndarray  # adiabatic sound speed
    dpdr_e: jnp.ndarray  # (dp/drho)|e
    dpde: jnp.ndarray  # (dp/de)|rho
    dpdT: jnp.ndarray
    dedT: jnp.ndarray  # c_v * (per gram)
    cv: jnp.ndarray
    cp: jnp.ndarray
    mu: jnp.ndarray  # mean molecular weight
    abar: jnp.ndarray
    zbar: jnp.ndarray


class Eos:
    """Base EOS. Subclasses implement the (rho,T)->state core and inversions."""

    #: does this EOS depend on composition?
    uses_composition: bool = True

    #: pure-arithmetic EOS (no table gathers/iteration) — safe to evaluate
    #: inside a Pallas TPU kernel (the fused ctoprim path)
    pallas_safe: bool = False

    def mu_from_xn(self, xn: Optional[jnp.ndarray]):
        raise NotImplementedError

    # -- input modes (reference: eos_input_rt / re / rp / rh / tp / ph) ----
    def rt(self, rho, T, xn=None) -> EosState:
        raise NotImplementedError

    def re(self, rho, e, xn=None) -> EosState:
        raise NotImplementedError

    def rp(self, rho, p, xn=None) -> EosState:
        raise NotImplementedError

    def rh(self, rho, h, xn=None) -> EosState:
        raise NotImplementedError

    def tp(self, T, p, xn=None) -> EosState:
        raise NotImplementedError

    def ph(self, p, h, xn=None) -> EosState:
        raise NotImplementedError

    def __call__(self, mode: str, **kw) -> EosState:
        return getattr(self, mode)(**kw)
