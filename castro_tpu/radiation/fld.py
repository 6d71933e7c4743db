"""Flux-limited-diffusion radiation: gray + multigroup implicit updates.

Reference: the Radiation singleton (`Source/radiation/Radiation.cpp`,
solver flags 5=gray SGFLD / 6=MGFLD `Radiation.H:20-31`), the gray
implicit update `single_group_update` (`SGRadSolver.cpp:20-265`: flux
limiter lambda(R), eta-weighted matter coupling, ABec assembly, iterate),
and the Levermore-Pomraning limiter closures (`fluxlimiter.F90`).

TPU design: the Hypre solve becomes the jitted matrix-free multigrid ABec
solve (castro_tpu/solvers/multigrid.py); the Newton-style outer coupling
iteration is a fixed-count loop so the whole implicit update is one XLA
program. Opacities are the reference's power-law models
(const_kappa_[pr] * rho^m * T^(-n) * nu^p, `Radiation.cpp` kappa parsing).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from castro_tpu.solvers import multigrid as mg
from castro_tpu.utils import constants as C


def fld_lambda(R, limiter=2):
    """Flux limiter lambda(R) (reference fluxlimiter.F90 closures):
    0: none (lambda=1/3); 2: Levermore-Pomraning approximate."""
    if limiter == 0:
        return jnp.full_like(R, 1.0 / 3.0)
    # LP approximate: lambda = (2+R)/(6+3R+R^2)
    return (2.0 + R) / (6.0 + 3.0 * R + R * R)


class FLDRadiation:
    def __init__(self, params, geom, layout):
        self.params = params
        self.geom = geom
        self.layout = layout
        rp = params.radiation
        self.ngroups = rp.ngroups if params.castro.do_radiation else 0
        self.limiter = rp.limiter
        self.c = C.c_light * rp.c_light_scale
        self.arad = C.a_rad
        self.outer_iters = 8

    # -- opacities (power-law models) ---------------------------------------
    def kappa_p(self, rho, T):
        rp = self.params.radiation
        k = rp.const_kappa_p
        if k < 0:  # fall back to Rosseland
            return self.kappa_r(rho, T)
        return jnp.maximum(
            k * rho**rp.kappa_p_exp_m * T ** (-rp.kappa_p_exp_n), rp.kappa_floor)

    def kappa_r(self, rho, T):
        rp = self.params.radiation
        k = rp.const_kappa_r
        kr = k * rho**rp.kappa_r_exp_m * T ** (-rp.kappa_r_exp_n) if k >= 0 else 0.0
        ks = (rp.const_scattering * rho**rp.scattering_exp_m *
              T ** (-rp.scattering_exp_n)) if rp.const_scattering > 0 else 0.0
        return jnp.maximum(kr + ks, max(rp.kappa_floor, 1e-30))

    # -- the implicit update -------------------------------------------------
    def _grown1(self, a, axis_names=None):
        """Grow by 1 ghost cell: Neumann (edge-clamp) at physical faces,
        true neighbor values across shard boundaries (ppermute)."""
        codes = (mg.NEUMANN,) * a.ndim
        if axis_names and any(n is not None for n in axis_names):
            return mg.sharded_fill_bc(a, codes, codes, axis_names)
        return mg.fill_bc(mg._grow(a), codes, codes)

    def _face_avg_grown(self, g, d):
        """Faces (n+1 along d) from a 1-ghost grown array."""
        out = g
        for k in range(g.ndim):
            if k != d:
                out = out[mg._take(out, k, 1, out.shape[k] - 1)]
        n = out.shape[d] - 2
        lo = out[mg._take(out, d, 0, n + 1)]
        hi = out[mg._take(out, d, 1, n + 2)]
        return 0.5 * (lo + hi)

    def _grad_mag_grown(self, Eg):
        dim = Eg.ndim
        g2 = 0.0
        for d in range(dim):
            v = Eg
            for k in range(dim):
                if k != d:
                    v = v[mg._take(v, k, 1, v.shape[k] - 1)]
            n = v.shape[d] - 2
            hi = v[mg._take(v, d, 2, n + 2)]
            lo = v[mg._take(v, d, 0, n)]
            g2 = g2 + ((hi - lo) / (2 * self.geom.dx[d])) ** 2
        return jnp.sqrt(g2)

    def diffusion_coeffs(self, Er, rho, T, axis_names=None):
        """Face-registered D = c*lambda/kappa_R per dim + cell lambda."""
        kr = self.kappa_r(rho, T)
        Eg = self._grown1(Er, axis_names)
        R = self._grad_mag_grown(Eg) / jnp.maximum(
            kr * jnp.maximum(Er, 1e-30), 1e-30)
        lam = fld_lambda(R, self.limiter)
        D = self.c * lam / kr
        Dg = self._grown1(D, axis_names)
        bcoefs = [self._face_avg_grown(Dg, d) for d in range(Er.ndim)]
        return bcoefs, lam

    def _bc(self):
        dim = self.geom.dim
        rp = self.params.radiation
        # Marshak/Dirichlet-value BCs when bcflag set; default Neumann
        # (zero-flux) at symmetry and Dirichlet(bcval) elsewhere
        lo, hi, vlo, vhi = [], [], [], []
        for d in range(dim):
            lo_code = self.params.castro.lo_bc[d]
            hi_code = self.params.castro.hi_bc[d]
            if lo_code == 0:
                lo.append("periodic")
                vlo.append(None)
            elif lo_code in (3, 4, 5):
                lo.append("neumann")
                vlo.append(None)
            else:
                lo.append("dirichlet")
                vlo.append(rp.lo_bcval[d] if rp.lo_bcflag[d] else 0.0)
            if hi_code == 0:
                hi.append("periodic")
                vhi.append(None)
            elif hi_code in (3, 4, 5):
                hi.append("neumann")
                vhi.append(None)
            else:
                hi.append("dirichlet")
                vhi.append(rp.hi_bcval[d] if rp.hi_bcflag[d] else 0.0)
        return tuple(lo), tuple(hi), vlo, vhi

    def gray_update(self, Er, rho, e, T_guess, cv, dt, axis_names=None):
        """One backward-Euler gray FLD solve with eta-linearized matter
        coupling (reference single_group_update). Returns (Er', e', T').

        All interior (ghost-free) arrays; with axis_names (inside
        shard_map) the linear solves are distributed (RadSolve.H:171's
        Hypre-over-MPI analog)."""
        cl = self.c
        a_r = self.arad
        bc_lo, bc_hi, bvl, bvh = self._bc()
        rtol = 1e-10 if Er.dtype == jnp.float64 else 1e-6

        def outer(carry, _):
            Er_k, e_k = carry
            T_k = T_guess + (e_k - e) / cv  # local linearization of T(e)
            T_k = jnp.maximum(T_k, 1e-10)
            kp = self.kappa_p(rho, T_k)
            bcoefs, lam = self.diffusion_coeffs(Er_k, rho, T_k, axis_names)

            beta = 4.0 * a_r * T_k**3 / (rho * cv)
            eta = beta * kp * cl * dt / (1.0 + beta * kp * cl * dt)

            # (1 + (1-eta) kp c dt) Er - dt div(D grad Er) =
            #    Er^- + (1-eta) kp c dt a T_k^4_lin + eta (e-term)
            # linearized emission: a T(e_k)^4 ~ aT_k^4 (iterated)
            acoef = 1.0 + (1.0 - eta) * kp * cl * dt
            rhs = Er + (1.0 - eta) * kp * cl * dt * a_r * T_k**4
            Er_new, res = mg.solve(
                rhs, self.geom.dx, acoef=acoef, bcoefs=bcoefs,
                alpha=1.0, beta=dt, bc_lo=bc_lo, bc_hi=bc_hi,
                bc_vals_lo=bvl, bc_vals_hi=bvh, n_vcycles=20, rtol=rtol,
                axis_names=axis_names)
            # matter update (internal_energy_update): eta-damped exchange
            de = -dt * kp * cl * (a_r * T_k**4 - Er_new) / rho
            e_new = e + de / (1.0 + beta * kp * cl * dt)
            return (Er_new, e_new), res

        (Er_f, e_f), _ = jax.lax.scan(outer, (Er, e), None,
                                      length=self.outer_iters)
        T_f = jnp.maximum(T_guess + (e_f - e) / cv, 1e-10)
        return Er_f, e_f, T_f

    def multigroup_update(self, Er_g, rho, e, T_guess, cv, dt, nu_centers,
                          dnu, axis_names=None):
        """MGFLD-style update: groups couple through the matter temperature
        (reference MGFLD_implicit_update outer iteration over groups;
        Doppler f-space advection TODO). Er_g: [ngroups, ...]."""
        cl = self.c
        a_r = self.arad
        bc_lo, bc_hi, bvl, bvh = self._bc()
        ng = Er_g.shape[0]
        rtol = 1e-10 if Er_g.dtype == jnp.float64 else 1e-6

        def planck_frac(T):
            """Fraction of a T^4 in each group (normalized Planck weights)."""
            x = nu_centers.reshape((ng,) + (1,) * T.ndim) / jnp.maximum(T, 1e-10)
            w = x**3 / jnp.expm1(jnp.clip(x, 1e-6, 80.0))
            w = w * dnu.reshape((ng,) + (1,) * T.ndim)
            return w / jnp.maximum(jnp.sum(w, axis=0), 1e-300)

        def outer(carry, _):
            Er_k, e_k = carry
            T_k = jnp.maximum(T_guess + (e_k - e) / cv, 1e-10)
            kp = self.kappa_p(rho, T_k)
            frac = planck_frac(T_k)
            beta = 4.0 * a_r * T_k**3 / (rho * cv)
            eta = beta * kp * cl * dt / (1.0 + beta * kp * cl * dt)

            Er_out = []
            for g in range(ng):
                bcoefs, lam = self.diffusion_coeffs(Er_k[g], rho, T_k,
                                                    axis_names)
                acoef = 1.0 + (1.0 - eta) * kp * cl * dt
                rhs = Er_k[g] * 0 + Er_g[g] + (1.0 - eta) * kp * cl * dt * \
                    a_r * T_k**4 * frac[g]
                Er_new, _ = mg.solve(
                    rhs, self.geom.dx, acoef=acoef, bcoefs=bcoefs,
                    alpha=1.0, beta=dt, bc_lo=bc_lo, bc_hi=bc_hi,
                    bc_vals_lo=bvl, bc_vals_hi=bvh, n_vcycles=15, rtol=rtol,
                    axis_names=axis_names)
                Er_out.append(Er_new)
            Er_new = jnp.stack(Er_out)
            de = -dt * kp * cl * (a_r * T_k**4 - jnp.sum(Er_new, axis=0)) / rho
            e_new = e + de / (1.0 + beta * kp * cl * dt)
            return (Er_new, e_new), 0.0

        (Er_f, e_f), _ = jax.lax.scan(outer, (Er_g, e), None,
                                      length=self.outer_iters)
        T_f = jnp.maximum(T_guess + (e_f - e) / cv, 1e-10)
        return Er_f, e_f, T_f

    def estdt(self, Er, rho, e, cv, T):
        """Radiation dt limiter (reference Radiation::EstTimeStep): limit
        relative change of Er by coupling; diffusion itself is implicit."""
        kp = self.kappa_p(rho, T)
        rate = kp * self.c * jnp.abs(self.arad * T**4 - Er)
        tau = jnp.min(jnp.maximum(Er, rho * e) / jnp.maximum(rate, 1e-300))
        return 0.5 * tau
