"""Network base class."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


class Network:
    """Species metadata + (for reactive networks) the burn RHS.

    Attributes
    ----------
    spec_names : tuple of species names
    aion, zion : jnp arrays [nspec] — mass and charge numbers
    ebin       : jnp arrays [nspec] — binding energy per gram (erg/g), for
                 networks that compute energy release from composition change
    reactive   : whether burn() does anything
    """

    spec_names: Tuple[str, ...] = ()
    aux_names: Tuple[str, ...] = ()
    reactive: bool = False

    def __init__(self, spec_names=(), aion=None, zion=None, ebin=None, aux_names=()):
        self.spec_names = tuple(spec_names)
        n = len(self.spec_names)
        self.aux_names = tuple(aux_names)
        self.aion = jnp.asarray(aion if aion is not None else np.ones(n))
        self.zion = jnp.asarray(zion if zion is not None else np.ones(n))
        self.ebin = jnp.asarray(ebin if ebin is not None else np.zeros(n))

    @property
    def nspec(self) -> int:
        return len(self.spec_names)

    @property
    def naux(self) -> int:
        return len(self.aux_names)

    def rhs(self, rho, T, xn, e=None):
        """Vectorized RHS: returns (xdot[nspec,...], edot[...]).

        Non-reactive networks return zeros (reference: general_null).
        """
        return jnp.zeros_like(xn), jnp.zeros_like(rho)
