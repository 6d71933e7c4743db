"""Radiating sphere (reference `Exec/radiation_tests/RadSphere`, Graziani
2008 / Swesty & Myra 2009): a hot (1500 eV) sphere of radius 0.02 cm at
the inner boundary of a 1D spherical shell radiates into a cold (50 eV)
ambient medium whose scattering opacity kappa = 1e13 (nu_0/nu)^3 makes it
optically thick at low frequency and thin at high frequency. 60
log-spaced photon groups; the analytic group spectrum at (r, t) is

  E_g(r,t) = [B(nu,T_0) + (R/r)(B(nu,T_s) - B(nu,T_0)) F(r,t,nu)] dnu

with F the erfc expression of Swesty & Myra eq. 76-77."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from castro_tpu.config import Params
from castro_tpu.utils import constants as C

NGROUPS = 60
NU_LO = 1.2089946159439434e14   # 0.5 eV
NU_HI = 7.3990470495769334e19   # 306 keV
NU_0 = 3.6e14                    # opacity reference frequency (Hz)
KAPPA_0 = 1.0e13                 # kappa at nu_0 (1/cm)
R_SPHERE = 0.02
R_OBS = 0.06
T_SPHERE = 1500.0 * C.ev2erg / C.k_B
T_0 = 5.8022593689285789e5       # ambient temperature (K)


def groups():
    """Log-spaced group edges / centers / widths (reference
    radiation.lowestGroupHz..highestGroupHz with nGroups=60)."""
    xnu = np.geomspace(NU_LO, NU_HI, NGROUPS + 1)
    nu_c = np.sqrt(xnu[:-1] * xnu[1:])
    dnu = np.diff(xnu)
    return xnu, nu_c, dnu


def planck(nu, T):
    """Blackbody energy density B = (4 pi / c) I [erg/cm^3/Hz]."""
    x = np.minimum(C.hplanck * nu / (C.k_B * T), 700.0)
    B = (8.0 * math.pi * C.hplanck * nu**3 / C.c_light**3) / np.expm1(x)
    return np.clip(B, 1e-50, 1e200)


def analytic_spectrum(r, t):
    """E_g(r, t) (Swesty & Myra 2009 eq. 76-77)."""
    _, nu_c, dnu = groups()
    kappa = KAPPA_0 * (NU_0 / nu_c) ** 3
    arg = np.sqrt(3.0 * kappa / (4.0 * C.c_light * max(t, 1e-50)))
    s = np.sqrt(C.c_light * t * kappa)
    from scipy.special import erfc  # available via scipy (test-only path)

    def sferfc(a):
        return erfc(np.clip(a, -26.0, 26.0))

    def sfexp(a):
        return np.exp(np.clip(a, -650.0, 650.0))

    F = 0.5 * (sfexp(-np.sqrt(3.0) * kappa * (r - R_SPHERE)) *
               sferfc(arg * (r - R_SPHERE) - s) +
               sfexp(np.sqrt(3.0) * kappa * (r - R_SPHERE)) *
               sferfc(arg * (r - R_SPHERE) + s))
    F = np.clip(F, 1e-50, 1e200)
    E = planck(nu_c, T_0) + (R_SPHERE / r) * (
        planck(nu_c, T_SPHERE) - planck(nu_c, T_0)) * F
    return E * dnu


def make_params(n=256, dtype="float64"):
    p = Params()
    p = p.with_ns("amr", n_cell=(n,))
    p = p.with_ns("geometry", coord_sys=2, prob_lo=(R_SPHERE, 0.0, 0.0),
                  prob_hi=(0.2, 1.0, 1.0))
    p = p.with_ns("castro", lo_bc=(3,), hi_bc=(2,), do_hydro=0,
                  do_radiation=1, fixed_dt=1e-15, small_temp=0.0)
    p = p.with_ns("eos", eos_name="rad_power_law", eos_gamma=5.0 / 3.0)
    p = p.replace(extra={"eos.const_c_v": 1.0e8})
    # The nu^-3 opacity enters as ABSORPTION/emission against the fixed-
    # temperature ambient matter: the analytic spectrum's steady-state
    # exp(-sqrt(3) kappa (r-R)) attenuation comes from the -c kappa (E -
    # B(T_0)) sink, which pure scattering (the reference inputs'
    # const_scatter) cannot produce in the zeroth-moment equation. With
    # absorption, the numeric spectrum matches the analytic to a few
    # percent across the bright bands.
    p = p.with_ns("radiation", ngroups=NGROUPS,
                  lo_bc=(101, 0, 0), hi_bc=(101, 0, 0),
                  const_kappa_p=4.6656e56, kappa_p_exp_p=-3.0,
                  const_kappa_r=4.6656e56, kappa_r_exp_p=-3.0,
                  limiter=0, outer_iters=2)
    p = p.with_ns("tpu", dtype=dtype)
    return p


def run(n=256, t_end=1.0e-12, dt=2.0e-15):
    """Evolve the multigroup field; returns (r, Er[ng, n], fld)."""
    from castro_tpu.geometry import geometry_from_params
    from castro_tpu.radiation.fld import FLDRadiation
    from castro_tpu.state import layout_from_params

    params = make_params(n=n)
    geom = geometry_from_params(params, jnp.float64)
    fld = FLDRadiation(params, geom, layout_from_params(params))

    xnu, nu_c, dnu = groups()
    # hot-sphere Planck spectrum as per-group Dirichlet values at r-lo;
    # ambient spectrum at r-hi (reference Tools/radbc.f90)
    fld.bc_group_vals_lo = jnp.asarray(planck(nu_c, T_SPHERE) * dnu)
    fld.bc_group_vals_hi = jnp.asarray(planck(nu_c, T_0) * dnu)

    r_f = np.asarray(geom.faces_1d(0, 0))
    areas = [jnp.asarray(4.0 * math.pi * r_f**2)]
    vol = jnp.asarray(4.0 * math.pi / 3.0 * (r_f[1:] ** 3 - r_f[:-1] ** 3))
    metric = {"areas": areas, "vol": vol}

    Er0 = jnp.asarray(planck(nu_c, T_0)[:, None] * dnu[:, None] *
                      np.ones((1, n)))
    rho = jnp.ones((n,))
    cv = jnp.full((n,), 1.0e8)
    T = jnp.full((n,), T_0)
    e = cv * T
    nu_j = jnp.asarray(nu_c)
    dnu_j = jnp.asarray(dnu)

    @jax.jit
    def step(Er, e_m):
        Er2, e2, T2 = fld.multigroup_update(Er, rho, e_m, T, cv, dt,
                                            nu_j, dnu_j, metric=metric)
        return Er2, e2

    nsteps = int(round(t_end / dt))
    Er, e_m = Er0, e
    for _ in range(nsteps):
        Er, e_m = step(Er, e_m)
    r = np.asarray(geom.cell_centers_1d(0, 0))
    return r, np.asarray(Er), fld
