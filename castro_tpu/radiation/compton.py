r"""Compton inelastic scattering between frequency groups (MGFLD).

TPU-native rebuild of the reference's group-to-group photon-energy
exchange (`Source/radiation/MGFLD.cpp:1655-1685` inelastic_scattering,
`Source/radiation/Rad_nd.F90:238-284` ca_inelastic_sct,
`Source/radiation/RadHydro_nd.F90:9-84` inelastic_scatter): the
Larsen, Levermore, Pomraning & Sanderson (1985, JCP 61, 359) implicit
discretization of the Kompaneets operator over the group axis.

The reference solves one LAPACK dgtsv tridiagonal system per zone.
Here every zone solves simultaneously: the tridiagonal coefficients are
built as `[ngroups, *spatial]` arrays (the spatial axes ride the TPU
vector lanes) and the solve is a Thomas-algorithm `lax.scan` over the
short group axis — ngroups sequential steps of whole-grid vector work,
no per-zone loop and no host LAPACK.

Scheme notes (mirroring `RadHydro_nd.F90`):

* ``u = Er / (nu * dlognu)`` is the spectrum in the group-measure
  normalization (``Erscale``, `Rad_nd.F90:266`); ``x = h nu / (m_e c^2)``.
* Interface upwind factors ``bh = exp((x_i - x_{i-1})/theta)`` encode
  detailed balance: the scheme's fixed point is the Wien spectrum
  ``u \propto x^3 exp(-x/theta)`` at the matter temperature (plus the
  induced-scattering ``gamma*u`` correction toward Bose–Einstein).
* The matrix is in flux form over ``dlognu``: photon number
  ``sum_g u_g dlognu_g`` is conserved to round-off; the change in total
  radiation energy is returned and must be taken out of the gas energy
  (`Rad_nd.F90:278-280`).
* f32-safety: ``bh - 1`` is evaluated with ``expm1`` and the products
  ``ah*bh`` as ``S + ah`` (exact identity ``S*bh/(bh-1) = S + S/(bh-1)``),
  so no ``exp`` overflow path exists; the exponent clamp is 80 in f32
  (e^80 ~ 5.5e34 < f32 max) and 150 in f64 (the reference's clamp).
* The reference's ``gamma`` uses a slightly wrong pi
  (3.141596565968186, `RadHydro_nd.F90:31`); we use the correct pi —
  a 2e-6 relative difference in the induced-scattering term only.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from castro_tpu.utils import constants as C

# h nu / (m_e c^2) conversion and Kompaneets induced-scattering measure
_MEC2 = C.m_e * C.c_light**2
_TFAC = C.k_B / _MEC2                              # theta = tfac * T
_XFAC = C.hplanck / _MEC2                          # x = xfac * nu
_GAMMA = C.hplanck**2 / (8.0 * math.pi * (C.m_e * C.c_light) ** 3)


def _thomas(sub, diag, sup, rhs):
    """Tridiagonal solve along axis 0 for [n, *spatial] coefficient
    arrays (sub[0] and sup[-1] are ignored). Thomas algorithm as two
    lax.scans over the short group axis; every spatial zone solves in
    parallel on the VPU. Replaces the reference's per-zone dgtsv."""

    def fwd(carry, x):
        cp_prev, dp_prev = carry
        a, b, c, r = x
        denom = b - a * cp_prev
        cp = c / denom
        dp = (r - a * dp_prev) / denom
        return (cp, dp), (cp, dp)

    zero = jnp.zeros_like(diag[0])
    (_, _), (cps, dps) = jax.lax.scan(fwd, (zero, zero),
                                      (sub, diag, sup, rhs))

    def bwd(x_next, x):
        cp, dp = x
        xg = dp - cp * x_next
        return xg, xg

    _, xs_rev = jax.lax.scan(bwd, zero, (cps, dps), reverse=True)
    return xs_rev


def inelastic_scatter(T, u, ks, dt, nugroup, xnu, dlognu):
    """One implicit Compton-exchange step on the normalized spectrum.

    T, ks: [*spatial] matter temperature and scattering opacity
    (1/cm); u: [ngroups, *spatial] = Er / (nu*dlognu); nugroup [ng],
    xnu [ng+1] group edges, dlognu [ng]. Returns the updated u.
    Mirrors `RadHydro_nd.F90:9-84` exactly (modulo the pi note above).
    """
    ng = u.shape[0]
    dtype = u.dtype
    sp = (1,) * (u.ndim - 1)
    x = (_XFAC * jnp.asarray(nugroup, dtype)).reshape((ng,) + sp)
    xh = (_XFAC * jnp.asarray(xnu, dtype)[1:ng]).reshape((ng - 1,) + sp)
    dli = (1.0 / jnp.asarray(dlognu, dtype)).reshape((ng,) + sp)
    emax = 150.0 if dtype == jnp.float64 else 80.0

    theta = (_TFAC * T)[None]
    sigmadt = (ks * (C.c_light * dt))[None]

    # interface j sits between groups j and j+1 (reference ah(i=j+2))
    uox = u / x
    uxh = 0.5 * (uox[:-1] + uox[1:])
    arg = jnp.minimum((x[1:] - x[:-1]) / theta, emax)
    S = sigmadt * (xh**2 + _GAMMA * uxh) ** 2
    ah = S / jnp.expm1(arg)          # = S/(bh-1)
    ahbh = S + ah                    # = S*bh/(bh-1), overflow-free
    cc = 1.0 / (x**3 + _GAMMA * u)

    zrow = jnp.zeros_like(u[:1])
    # row g: DL = -dli[g] cc[g-1] ah[g-1];  DU = -dli[g] cc[g+1] ahbh[g]
    sub = jnp.concatenate([zrow, -dli[1:] * cc[:-1] * ah], axis=0)
    sup = jnp.concatenate([-dli[:-1] * cc[1:] * ahbh, zrow], axis=0)
    lo = jnp.concatenate([zrow, ahbh], axis=0)   # ah[g-1]*bh[g-1] term
    hi = jnp.concatenate([ah, zrow], axis=0)     # ah[g] term
    diag = 1.0 + dli * cc * (lo + hi)
    # row equilibration (divide each row by its diagonal): the system's
    # condition number scales with the per-step optical depth sigmadt,
    # which f32 cannot absorb raw in the stiff limit
    u_new = _thomas(sub / diag, jnp.ones_like(diag), sup / diag, u / diag)
    # f32 safeguard (no-op at f64 precision): the exact photon-number
    # invariant sum_g u_g dlognu_g is re-imposed per zone after clamping
    # solver-roundoff negatives, so ultra-stiff zones land on a physical
    # spectrum instead of accumulating conservation error
    u_new = jnp.maximum(u_new, 0.0)
    dl = 1.0 / dli
    n0 = jnp.sum(u * dl, axis=0)
    n1 = jnp.sum(u_new * dl, axis=0)
    # skip zones whose photon number is zero/subnormal instead of
    # flooring the denominator: an absolute floor scales cold dim zones
    # by ~n0/floor and flushes their spectrum to zero in f32
    ratio = jnp.where(n1 > 0.0, n0 / jnp.where(n1 > 0.0, n1, 1.0), 1.0)
    return u_new * ratio[None]


def apply_inelastic_scattering(Er_g, T, ks, dt, nugroup, xnu, dlognu):
    """Driver-level wrapper (`Rad_nd.F90:238-284` ca_inelastic_sct):
    rescale Er by the group measure nu*dlognu, exchange, rescale back.
    Er_g: [ngroups, *spatial]. Returns (Er_new, dEr) with dEr the net
    radiation-energy gain to be subtracted from the gas (rho e and
    rho E alike, reference lines 278-280)."""
    ng = Er_g.shape[0]
    dtype = Er_g.dtype
    sp = (ng,) + (1,) * (Er_g.ndim - 1)
    erscale = (jnp.asarray(nugroup, dtype)
               * jnp.asarray(dlognu, dtype)).reshape(sp)
    u = Er_g / erscale
    u = inelastic_scatter(T, u, ks, dt, nugroup, xnu, dlognu)
    Er_new = u * erscale
    dEr = jnp.sum(Er_new - Er_g, axis=0)
    return Er_new, dEr
