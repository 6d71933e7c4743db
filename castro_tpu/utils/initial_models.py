"""Initial-model generators: 1D hydrostatic structures built through the
EOS, for the science problems that read model files in the reference
(`Util/initial_models`, `AMReX-Astro/initial_models`: toy_atm for
flame_wave/xrb, spherical WD models for sub_chandra/wdmerger,
plane-parallel convecting atmospheres for reacting_bubble/toy_convect).

The reference generates these offline (Fortran tools writing model files
read by `model_parser`); here they are generated at problem-init time —
the marching integrations are host-side numpy (init only, never in the
step path), with the EOS evaluated pointwise through its JAX interface.

All generators return dicts of numpy arrays keyed like model files
(`density`, `temperature`, `pressure`, `spec_*`), so `InitialModel`
consumers and these generators are interchangeable.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np
import jax.numpy as jnp

from castro_tpu.utils import constants as C


# the marching integrations make O(10^4) pointwise EOS calls; jit one
# scalar evaluator per EOS instance so each is a cached dispatch, not an
# eager op-by-op trace
_PF_CACHE: dict = {}


def _pfun(eos):
    key = id(eos)
    if key not in _PF_CACHE:
        import jax

        def f(rho, T, xn):
            s = eos.rt(rho=rho, T=T, xn=xn)
            return s.p[0], s.dpdr_e[0], s.gam1[0]

        _PF_CACHE[key] = jax.jit(f)
    return _PF_CACHE[key]


def _eos_eval(eos, rho, T, xn):
    p, dpdr, gam1 = _pfun(eos)(jnp.asarray([float(rho)]),
                               jnp.asarray([float(T)]),
                               jnp.asarray(np.asarray(xn, dtype=float)
                                           ).reshape(-1, 1))
    return float(p), float(dpdr), float(gam1)


def _p_of_rho(eos, rho, T, xn):
    p, dpdr, _ = _eos_eval(eos, rho, T, xn)
    return p, dpdr


def hse_plane_parallel(eos, z, rho_base, T_base, g,
                       xn_of_z: Callable[[float], np.ndarray],
                       T_of_z: Optional[Callable[[float], float]] = None,
                       isentropic_until: Optional[float] = None,
                       T_min: float = 0.0) -> Dict[str, np.ndarray]:
    """March a plane-parallel HSE column upward: p_i = p_{i-1} + rho_avg
    g dz (g < 0 for downward gravity), Newton in rho at each level.

    Temperature handling (reference toy_atm / toy_convect generators):
      * T_of_z given           : prescribed profile
      * isentropic_until given : adiabatic (constant entropy via the EOS
        adiabat dT/dz = (Gamma_2-1)/Gamma_2 * T/p * dp/dz) up to that
        height, then isothermal at max(T, T_min)
      * otherwise              : isothermal at T_base
    """
    n = len(z)
    dz = float(z[1] - z[0])
    rho = np.zeros(n)
    T = np.zeros(n)
    p = np.zeros(n)
    nspec = len(np.asarray(xn_of_z(float(z[0]))))
    xn = np.zeros((nspec, n))

    rho[0] = rho_base
    T[0] = T_base if T_of_z is None else T_of_z(float(z[0]))
    xn[:, 0] = xn_of_z(float(z[0]))
    p[0], _ = _p_of_rho(eos, rho[0], T[0], xn[:, 0])

    for i in range(1, n):
        xn[:, i] = xn_of_z(float(z[i]))
        if T_of_z is not None:
            T[i] = T_of_z(float(z[i]))
        elif isentropic_until is not None and z[i] <= isentropic_until:
            # adiabatic lapse through the EOS: dT = (gam3-1) T/p dp
            _, _, gam1 = _eos_eval(eos, rho[i - 1], T[i - 1], xn[:, i - 1])
            dp_est = rho[i - 1] * g * dz
            nabla_ad = (gam1 - 1.0) / gam1
            T[i] = max(T[i - 1] * (1.0 + nabla_ad * dp_est / p[i - 1]),
                       T_min)
        elif isentropic_until is not None:
            # above the adiabatic layer: isothermal continuation
            T[i] = max(T[i - 1], T_min)
        else:
            T[i] = max(T_base, T_min)
        r = rho[i - 1]
        for _ in range(20):
            pi, dpdr = _p_of_rho(eos, r, T[i], xn[:, i])
            f = pi - (p[i - 1] + 0.5 * (rho[i - 1] + r) * g * dz)
            df = dpdr - 0.5 * g * dz
            r_new = r - f / df
            if not np.isfinite(r_new) or r_new <= 0:
                r_new = 0.5 * r
            if abs(r_new - r) < 1e-12 * r:
                r = r_new
                break
            r = r_new
        rho[i] = max(r, 1e-30)
        p[i], _ = _p_of_rho(eos, rho[i], T[i], xn[:, i])

    out = {"r": np.asarray(z, dtype=float), "density": rho,
           "temperature": T, "pressure": p}
    for k in range(nspec):
        out[f"spec_{k}"] = xn[k]
    return out


# one compiled marcher per (eos, callback, nshell) combination — the
# WD-mass bisection re-runs the march ~15x, so the scan must be jitted
_SPH_CACHE: dict = {}


def hse_spherical(eos, r, rho_c, T_c,
                  xn_of_m: Callable,
                  T_of_rho: Optional[Callable] = None,
                  rho_cutoff: float = 1e-4) -> Dict[str, np.ndarray]:
    """Integrate a spherical hydrostatic star outward:
    dp/dr = -G m(r) rho / r^2,  dm/dr = 4 pi r^2 rho, Newton in rho per
    shell — the WD-model construction behind sub_chandra / wdmerger
    (reference initial_models spherical tools).  xn_of_m maps the
    enclosed mass to composition (so shell compositions hang on mass
    coordinates); T_of_rho optionally prescribes T(rho) (default:
    isothermal at T_c).  Integration freezes at floor values once
    rho < rho_cutoff.

    TPU-native: the whole march is one jitted `lax.scan` over shells
    (inner fixed-count Newton per shell), so the mass bisection in
    `wd_model_for_mass` costs ~ms per candidate instead of an eager
    Python loop.  Both callbacks must therefore be jnp-traceable
    (`jnp.where`, not Python `if`, on their scalar argument).
    """
    import jax
    from jax import lax

    key = (id(eos), id(xn_of_m), id(T_of_rho), len(r), float(rho_cutoff))
    if key not in _SPH_CACHE:
        def p_dpdr(rho, T, xn):
            s = eos.rt(rho=rho[None], T=T[None], xn=xn[:, None])
            return s.p[0], s.dpdr_e[0]

        def march(r_arr, rho_c_, T_c_):
            dr = r_arr[1] - r_arr[0]
            xn0 = xn_of_m(jnp.asarray(0.0))
            T0 = T_c_ if T_of_rho is None else T_of_rho(rho_c_)
            p0, _ = p_dpdr(rho_c_, T0, xn0)
            m0 = 4.0 / 3.0 * np.pi * r_arr[0] ** 3 * rho_c_

            def step(carry, r_i):
                rho_p, T_p, p_p, m_p, xn_p, done, r_p = carry
                g_face = -C.Gconst * m_p / (0.5 * (r_i + r_p)) ** 2
                T_i = T_p if T_of_rho is None else T_of_rho(rho_p)

                def newton(_, rg):
                    pi, dpdr = p_dpdr(rg, T_i, xn_p)
                    f = pi - (p_p + 0.5 * (rho_p + rg) * g_face * dr)
                    df = dpdr - 0.5 * g_face * dr
                    rn = rg - f / df
                    return jnp.where(jnp.isfinite(rn) & (rn > 0),
                                     rn, 0.5 * rg)

                rho_i = lax.fori_loop(0, 16, newton, rho_p)
                done_i = done | (rho_i < rho_cutoff)
                rho_i = jnp.where(done_i, rho_cutoff, rho_i)
                if T_of_rho is not None:
                    T_i = T_of_rho(rho_i)
                p_i, _ = p_dpdr(rho_i, T_i, xn_p)
                m_i = jnp.where(
                    done_i, m_p,
                    m_p + 4.0 * np.pi * (0.5 * (r_i + r_p)) ** 2 *
                    rho_i * dr)
                xn_i = xn_of_m(m_i)
                carry = (rho_i, T_i, p_i, m_i, xn_i, done_i, r_i)
                return carry, (rho_i, T_i, p_i, m_i, xn_i)

            init = (rho_c_, T0, p0, m0, xn0,
                    jnp.asarray(False), r_arr[0])
            _, (rho_s, T_s, p_s, m_s, xn_s) = lax.scan(
                step, init, r_arr[1:])
            cat = lambda h, t: jnp.concatenate([h[None], t])
            return (cat(rho_c_, rho_s), cat(T0, T_s), cat(p0, p_s),
                    cat(m0, m_s),
                    jnp.concatenate([xn0[None], xn_s]).T)

        _SPH_CACHE[key] = jax.jit(march)

    rho, T, p, m, xn = _SPH_CACHE[key](
        jnp.asarray(np.asarray(r, dtype=float)),
        jnp.asarray(float(rho_c)), jnp.asarray(float(T_c)))
    out = {"r": np.asarray(r, dtype=float), "density": np.asarray(rho),
           "temperature": np.asarray(T), "pressure": np.asarray(p),
           "mass": np.asarray(m)}
    xn = np.asarray(xn)
    for k in range(xn.shape[0]):
        out[f"spec_{k}"] = xn[k]
    return out


def wd_mass(model: Dict[str, np.ndarray]) -> float:
    """Total mass (g) of a spherical model (above its floor tail)."""
    rho = model["density"]
    floor = rho.min()
    live = rho > 1.5 * floor
    return float(model["mass"][np.argwhere(live).max()]) if live.any() \
        else 0.0


def wd_model_for_mass(eos, r, M_target, T_c, xn_of_m, rho_c_lo=1e5,
                      rho_c_hi=5e9, iters=30, **kw) -> Dict[str, np.ndarray]:
    """Bisect the central density so the spherical model hits a target
    mass (reference wdmerger's initial model iteration)."""
    lo, hi = np.log(rho_c_lo), np.log(rho_c_hi)
    model = None
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        model = hse_spherical(eos, r, float(np.exp(mid)), T_c, xn_of_m,
                              **kw)
        if wd_mass(model) < M_target:
            lo = mid
        else:
            hi = mid
    return model


def model_to_grid(model: Dict[str, np.ndarray], r_query) -> Dict[str, np.ndarray]:
    """Linear interpolation of every model variable onto query radii."""
    r = model["r"]
    return {k: np.interp(np.asarray(r_query), r, v)
            for k, v in model.items()
            if k != "r" and np.ndim(v) == 1}


def toy_atm(eos, z, dens_base, T_star, T_hi, T_lo, H_star, atm_delta,
            xn_star, xn_base, g) -> Dict[str, np.ndarray]:
    """The `toy_atm` atmosphere family (reference
    `Exec/science/convective_flame/initial_model.H`, also the shape
    behind the toy_xrb / flame_wave / nova accreted-layer models):

      * substrate at T_star below H_star,
      * tanh transition (width atm_delta, centered 1.5 delta above
        H_star) of both T -> T_hi and composition xn_star -> xn_base,
      * isentropic continuation above H_star + 3 delta with a T_lo floor
        (isothermal once the floor is hit),
      * HSE marched upward from p(dens_base, T_star, xn_star).
    """
    n = len(z)
    dz = float(z[1] - z[0])
    xn_star = np.asarray(xn_star, dtype=float)
    xn_base = np.asarray(xn_base, dtype=float)
    nspec = len(xn_star)
    z0 = float(z[0])

    rho = np.zeros(n)
    T = np.zeros(n)
    p = np.zeros(n)
    xn = np.zeros((nspec, n))

    for i in range(n):
        xc = (z[i] - z0) - H_star - 1.5 * atm_delta
        f = 0.5 * (1.0 + np.tanh(xc / (0.5 * atm_delta)))
        xi = xn_star + (xn_base - xn_star) * f
        xn[:, i] = xi / xi.sum()
        if (z[i] - z0) <= H_star:
            T[i] = T_star
        else:
            T[i] = T_star + (T_hi - T_star) * f

    rho[0] = dens_base
    p[0], _ = _p_of_rho(eos, rho[0], T[0], xn[:, 0])
    isen_start = H_star + 3.0 * atm_delta
    for i in range(1, n):
        if (z[i] - z0) > isen_start:
            # isentropic: adiabatic T drop with the pressure, floored
            _, _, gam1 = _eos_eval(eos, rho[i - 1], T[i - 1], xn[:, i - 1])
            dp_est = rho[i - 1] * g * dz
            T[i] = max(T[i - 1] * (1.0 + (gam1 - 1.0) / gam1 *
                                   dp_est / p[i - 1]), T_lo)
        r = rho[i - 1]
        for _ in range(20):
            pi, dpdr = _p_of_rho(eos, r, T[i], xn[:, i])
            f = pi - (p[i - 1] + 0.5 * (rho[i - 1] + r) * g * dz)
            df = dpdr - 0.5 * g * dz
            r_new = r - f / df
            if not np.isfinite(r_new) or r_new <= 0:
                r_new = 0.5 * r
            if abs(r_new - r) < 1e-12 * r:
                r = r_new
                break
            r = r_new
        rho[i] = max(r, 1e-30)
        p[i], _ = _p_of_rho(eos, rho[i], T[i], xn[:, i])

    out = {"r": np.asarray(z, dtype=float), "density": rho,
           "temperature": T, "pressure": p}
    for k in range(nspec):
        out[f"spec_{k}"] = xn[k]
    return out


def isentrope_through(eos, rho0, T0, xn, p_min_fac=0.3, p_max_fac=4.0,
                      npts=512):
    """Tabulate the isentrope through (rho0, T0): integrate
    dT/drho|_s = (Gamma_3 - 1) T / rho  (Gamma_3 - 1 = dpdT/(rho c_v))
    over a density range wide enough to cover p in
    [p_min_fac, p_max_fac] * p(rho0,T0). Returns dict(rho, T, p) sorted
    by p — the (p, s)=const inversion behind the reference's
    eos_input_ps initialization (reacting_convergence
    problem_initialize_state_data.H)."""
    xn = np.asarray(xn, dtype=float)

    def g3m1(rho, T):
        s = eos.rt(rho=jnp.asarray(rho), T=jnp.asarray(T), xn=jnp.asarray(xn))
        return float(s.dpdT) / (rho * float(s.cv)), float(s.p)

    # march up and down in log rho with RK2
    n_half = npts // 2
    lr0 = np.log(rho0)
    out_r = [rho0]
    out_T = [T0]
    _, p0 = g3m1(rho0, T0)
    out_p = [p0]
    for direction in (+1, -1):
        rho, T = rho0, T0
        dlr = direction * 3.0 / n_half
        for _ in range(n_half):
            g1, _ = g3m1(rho, T)
            T_mid = T * np.exp(g1 * dlr * 0.5)
            rho_mid = rho * np.exp(dlr * 0.5)
            g2, _ = g3m1(rho_mid, T_mid)
            T = T * np.exp(g2 * dlr)
            rho = rho * np.exp(dlr)
            _, p = g3m1(rho, T)
            out_r.append(rho)
            out_T.append(T)
            out_p.append(p)
            if p > p_max_fac * p0 and direction > 0:
                break
            if p < p_min_fac * p0 and direction < 0:
                break
    order = np.argsort(out_p)
    return {"rho": np.asarray(out_r)[order], "T": np.asarray(out_T)[order],
            "p": np.asarray(out_p)[order]}
