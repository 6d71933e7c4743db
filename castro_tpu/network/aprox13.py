"""aprox13: 13-isotope alpha-chain network (He4 .. Ni56).

Reference: Microphysics networks/aprox13 (Timmes' approx13), used by the
wdmerger / flame_wave science problems (SURVEY.md A5).

Round-1 status: species set, binding energies and energy generation are
final; the reaction rates use simplified analytic fits (CF88-style
triple-alpha + power-law alpha-capture approximations) rather than the full
Timmes rate tables + screening. The RHS is fully vectorized over zones, so
swapping in higher-fidelity rates later does not change the integrator.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from castro_tpu.network.base import Network
from castro_tpu.utils import constants as C

_SPECIES = ("He4", "C12", "O16", "Ne20", "Mg24", "Si28", "S32",
            "Ar36", "Ca40", "Ti44", "Cr48", "Fe52", "Ni56")
_A = np.array([4, 12, 16, 20, 24, 28, 32, 36, 40, 44, 48, 52, 56], dtype=float)
_Z = np.array([2, 6, 8, 10, 12, 14, 16, 18, 20, 22, 24, 26, 28], dtype=float)
# total nuclear binding energies (MeV)
_B_MEV = np.array([28.29603, 92.16294, 127.62093, 160.64788, 198.25790,
                   236.53790, 271.78250, 306.72020, 342.05680, 375.47720,
                   411.46900, 447.70800, 483.99500])


class Aprox13Network(Network):
    reactive = True

    def __init__(self):
        ebin = _B_MEV * C.MeV2erg * C.N_A / _A  # erg/g binding energy
        super().__init__(_SPECIES, aion=_A, zion=_Z, ebin=ebin)

    def rhs(self, rho, T, xn, e=None):
        """Vectorized dX/dt, de/dt (erg/g/s).

        Molar abundances Y_k = X_k / A_k; energy from dY . (N_A * B_k).
        """
        T9 = T * 1.0e-9
        T9 = jnp.maximum(T9, 1.0e-4)
        Y = xn / self.aion.reshape((-1,) + (1,) * (xn.ndim - 1))

        ydot = [jnp.zeros_like(rho) for _ in range(13)]

        # triple-alpha: 3 He4 -> C12 (CF88-style fit)
        lam3a = 2.79e-8 * (rho ** 2) * (Y[0] ** 3) / (T9 ** 3) * jnp.exp(-4.4027 / T9)
        r3a = lam3a  # dY(C12)/dt contribution
        ydot[0] = ydot[0] - 3.0 * r3a
        ydot[1] = ydot[1] + r3a

        # alpha captures k + He4 -> k+1 for C12..Fe52 (simplified rates)
        # rate_k = Y_He * Y_k * rho * f_k(T9); f uses a Gamow-like exponential
        # with effective coulomb barrier growing with Z.
        coef = jnp.asarray([2.0e8, 1.0e8, 5.0e7, 3.0e7, 2.0e7, 1.5e7,
                            1.0e7, 8.0e6, 6.0e6, 5.0e6, 4.0e6, 3.0e6])
        barrier = jnp.asarray([32.1, 39.8, 46.9, 53.4, 59.5, 65.2,
                               70.7, 75.9, 80.9, 85.7, 90.3, 94.8])
        for k in range(1, 13 - 1 + 1):
            if k >= 12:
                break
            fk = coef[k - 1] * jnp.exp(-barrier[k - 1] / (T9 ** (1.0 / 3.0))) / (T9 ** (2.0 / 3.0))
            rk = rho * Y[0] * Y[k] * fk
            ydot[0] = ydot[0] - rk
            ydot[k] = ydot[k] - rk
            ydot[k + 1] = ydot[k + 1] + rk

        ydot_arr = jnp.stack(ydot)
        xdot = ydot_arr * self.aion.reshape((-1,) + (1,) * (xn.ndim - 1))
        # energy generation: sum of binding-energy changes
        bion = (_B_MEV * C.MeV2erg * C.N_A)
        bion = jnp.asarray(bion).reshape((-1,) + (1,) * (xn.ndim - 1))
        edot = jnp.sum(ydot_arr * bion, axis=0)
        return xdot, edot
