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
    """Flux limiter lambda(R) — the full reference closure family
    (fluxlimiter.F90:31-66 FLDlambda):

      0       : no limiter, lambda = 1/3
      [1-3]   : Levermore-Pomraning approximate  (2+R)/(6+3R+R^2)
      1[1-3]  : Bruenn                           1/(3+R)
      2[1-3]  : Larsen square-root               1/sqrt(9+R^2)
      3[1-3]  : Minerbo                          2/(3+sqrt(9+12R^2)) R<1.5
                                                 1/(1+R+sqrt(1+2R))  else
    """
    if limiter == 0:
        return jnp.full_like(R, 1.0 / 3.0)
    if limiter < 10:  # approximate LP
        return (2.0 + R) / (6.0 + R * (3.0 + R))
    if limiter < 20:  # Bruenn
        return 1.0 / (3.0 + R)
    if limiter < 30:  # Larsen
        return 1.0 / jnp.sqrt(9.0 + R * R)
    if limiter < 40:  # Minerbo
        return jnp.where(
            R < 1.5,
            2.0 / (3.0 + jnp.sqrt(9.0 + 12.0 * R * R)),
            1.0 / (1.0 + R + jnp.sqrt(1.0 + 2.0 * R)))
    raise ValueError(f"unknown radiation limiter {limiter}")


def edd_factor(lam, R, closure=3):
    """Eddington factor f(lambda) (reference fluxlimiter.F90:68-130
    Edd_factor): 0: f=lambda; 1: f=1/3; 2: f=1-2lambda;
    3: f=lambda+(lambda R)^2 (LP); 4: f=1/3+2/3(lambda R)^2."""
    if closure == 0:
        return lam
    if closure == 1:
        return jnp.full_like(lam, 1.0 / 3.0)
    if closure == 2:
        return 1.0 - 2.0 * lam
    if closure == 3:
        return lam + (lam * R) ** 2
    if closure == 4:
        return 1.0 / 3.0 + 2.0 / 3.0 * (lam * R) ** 2
    raise ValueError(f"unknown radiation closure {closure}")


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
        self.outer_iters = rp.outer_iters
        self._metric_cache = None
        self._metric_built = False
        # frequency-group layout (reference RadMultiGroup.cpp) when the
        # inputs define one; problems may overwrite these attributes with
        # custom spectra (e.g. RadSphere's keV-derived groups)
        self.nugroup = self.dnugroup = self.dlognu = self.xnu = None
        if self.ngroups > 1 and rp.lowest_group_hz >= 0.0:
            from castro_tpu.radiation.fspace import group_structure

            gs = group_structure(self.ngroups, rp.lowest_group_hz,
                                 rp.highest_group_hz, rp.group_grow_factor,
                                 rp.first_group_width_hz)
            self.nugroup = jnp.asarray(gs["nugroup"])
            self.dnugroup = jnp.asarray(gs["dnugroup"])
            self.dlognu = jnp.asarray(gs["dlognu"])
            self.xnu = jnp.asarray(gs["xnu"])

    def planck_weights(self, T, nu_centers=None, dnu=None):
        """Fraction of aT^4 carried by each group (normalized Planck
        weights; reference MGFLD.cpp BGroup integration)."""
        nu_c = self.nugroup if nu_centers is None else nu_centers
        dn = self.dnugroup if dnu is None else dnu
        shape_nu = (nu_c.shape[0],) + (1,) * jnp.ndim(T)
        x = (C.hplanck / C.k_B) * nu_c.reshape(shape_nu) / \
            jnp.maximum(T, 1e-10)
        w = x**3 / jnp.expm1(jnp.clip(x, 1e-6, 80.0))
        w = w * dn.reshape(shape_nu)
        return w / jnp.maximum(jnp.sum(w, axis=0), 1e-300)

    # -- opacities (power-law models, reference Radiation.cpp kappa
    #    parsing: kappa = const * rho^m * T^(-n) * nu^p) -------------------
    def kappa_p(self, rho, T, nu=None):
        rp = self.params.radiation
        k = rp.const_kappa_p
        if k < 0:  # fall back to Rosseland
            return self.kappa_r(rho, T, nu)
        kp = k * rho**rp.kappa_p_exp_m * T ** (-rp.kappa_p_exp_n)
        if nu is not None and rp.kappa_p_exp_p != 0.0:
            kp = kp * nu ** rp.kappa_p_exp_p
        return jnp.maximum(kp, rp.kappa_floor)

    def kappa_r(self, rho, T, nu=None):
        rp = self.params.radiation
        k = rp.const_kappa_r
        kr = k * rho**rp.kappa_r_exp_m * T ** (-rp.kappa_r_exp_n) if k > 0 else 0.0
        if nu is not None and k > 0 and rp.kappa_r_exp_p != 0.0:
            kr = kr * nu ** rp.kappa_r_exp_p
        if rp.const_scattering > 0:
            ks = (rp.const_scattering * rho**rp.scattering_exp_m *
                  T ** (-rp.scattering_exp_n))
            if nu is not None and rp.scattering_exp_p != 0.0:
                ks = ks * nu ** rp.scattering_exp_p
        else:
            ks = 0.0
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

    def diffusion_coeffs(self, Er, rho, T, axis_names=None, kr=None):
        """Face-registered D = c*lambda/kappa_R per dim + cell lambda."""
        if kr is None:
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
        """Radiation boundary conditions (reference Radiation.cpp BC
        parsing + RadBndry): explicit `radiation.lo_bc/hi_bc` codes
        101=Dirichlet / 102=Neumann(inward flux) / 104=Marshak(incident
        flux) / 105=Sanchez-Pomraning(treated as Marshak); with no
        explicit codes, derived from the hydro BCs. Returns
        (codes_lo, codes_hi, spec_lo, spec_hi) where spec entries are
        ("value", v) | ("flux", v) | ("marshak", Finc) | None — the
        flux/Marshak entries become Robin ghost relations once the face
        diffusion coefficients are known (see `_bc_vals`)."""
        dim = self.geom.dim
        rp = self.params.radiation
        lo, hi, vlo, vhi = [], [], [], []
        for d in range(dim):
            for side, rcode, hcode, codes, vals in (
                ("lo", rp.lo_bc[d], self.params.castro.lo_bc[d], lo, vlo),
                ("hi", rp.hi_bc[d], self.params.castro.hi_bc[d], hi, vhi),
            ):
                bcval = (rp.lo_bcval if side == "lo" else rp.hi_bcval)[d]
                if rcode == 101:
                    codes.append("dirichlet")
                    gv = getattr(self, "bc_group_vals_" + side, None)
                    vals.append(("value_groups", None) if gv is not None
                                else ("value", bcval))
                elif rcode == 102:
                    if bcval == 0.0:
                        codes.append("neumann")
                        vals.append(None)
                    else:
                        codes.append("robin")
                        vals.append(("flux", bcval))
                elif rcode in (104, 105):
                    codes.append("robin")
                    vals.append(("marshak", bcval))
                elif hcode == 0:
                    codes.append("periodic")
                    vals.append(None)
                elif hcode in (3, 4, 5):
                    codes.append("neumann")
                    vals.append(None)
                else:
                    codes.append("dirichlet")
                    vals.append(("value",
                                 bcval if (rp.lo_bcflag if side == "lo"
                                           else rp.hi_bcflag)[d] else 0.0))
        return tuple(lo), tuple(hi), vlo, vhi

    def _bc_vals(self, spec_lo, spec_hi, bcoefs, vlo_g=None, vhi_g=None):
        """Concrete BC values from the specs + current face diffusion
        coefficients. Marshak (vacuum, incident flux F_inc): the net
        outward face flux is c*E/2 - 2*F_inc (two-stream closure; HABEC
        bfm=0.5*beta*c, bfv=2*beta), giving the ghost relation
        E_g = (1 - h c / (2 D)) E_i + 2 F_inc h / D."""
        dim = self.geom.dim
        vlo, vhi = [], []
        for d in range(dim):
            h = self.geom.dx[d]
            b = bcoefs[d]
            n = b.shape[d] - 1
            D_lo = b[mg._take(b, d, 0, 1)]
            D_hi = b[mg._take(b, d, n, n + 1)]
            for spec, vals, D, gv in ((spec_lo[d], vlo, D_lo, vlo_g),
                                      (spec_hi[d], vhi, D_hi, vhi_g)):
                if spec is None:
                    vals.append(None)
                elif spec[0] == "value_groups":
                    vals.append(gv)
                elif spec[0] in ("value", "value_arr"):
                    vals.append(spec[1])
                elif spec[0] == "flux":
                    # fixed inward flux F: D (E_i - E_g)/h = -F_in
                    A = jnp.ones_like(D)
                    G = spec[1] * h / jnp.maximum(D, 1e-300)
                    vals.append((A, G))
                else:  # marshak
                    Dm = jnp.maximum(D, 1e-300)
                    A = 1.0 - h * self.c / (2.0 * Dm)
                    G = 2.0 * spec[1] * h / Dm
                    vals.append((A, G))
        return vlo, vhi

    def geom_metric(self):
        """Curvilinear {areas, vol} metric for the diffusion solves (the
        reference's RadSolve cellCenteredApplyMetrics); None in Cartesian.
        Supports 1D spherical/cylindrical and 2D axisymmetric (RZ)."""
        import math

        import numpy as np

        from castro_tpu.geometry import CoordSys

        if self._metric_built:
            return self._metric_cache
        self._metric_built = True
        g = self.geom
        if g.coord == CoordSys.CARTESIAN:
            return None
        r_f = np.asarray(g.faces_1d(0, 0))
        if g.dim == 1:
            if g.coord == CoordSys.SPHERICAL:
                areas = [jnp.asarray(4.0 * math.pi * r_f**2)]
                vol = jnp.asarray(4.0 * math.pi / 3.0 *
                                  (r_f[1:] ** 3 - r_f[:-1] ** 3))
            else:  # cylindrical (per unit height)
                areas = [jnp.asarray(2.0 * math.pi * r_f)]
                vol = jnp.asarray(math.pi * (r_f[1:] ** 2 - r_f[:-1] ** 2))
            self._metric_cache = {"areas": areas, "vol": vol}
            return self._metric_cache
        if g.dim == 2 and g.coord == CoordSys.CYLINDRICAL:
            dz = float(g.dx[1])
            r_c = 0.5 * (r_f[1:] + r_f[:-1])
            ar = jnp.asarray(2.0 * math.pi * r_f)[:, None] * dz
            az = jnp.asarray(2.0 * math.pi * r_c * float(g.dx[0]))[:, None] \
                * jnp.ones((1, g.n_cell[1] + 1))
            vol = jnp.asarray(math.pi * (r_f[1:] ** 2 - r_f[:-1] ** 2)
                              )[:, None] * dz
            self._metric_cache = {"areas": [ar * jnp.ones((1, g.n_cell[1])),
                                            az],
                                  "vol": vol * jnp.ones((1, g.n_cell[1]))}
            return self._metric_cache
        return None

    def gray_update(self, Er, rho, e, T_guess, cv, dt, axis_names=None,
                    eos_re=None, metric=None, bc_override=None,
                    rhs_extra=None, keep_flux=False):
        """One backward-Euler gray FLD solve with eta-linearized matter
        coupling (reference single_group_update). Returns (Er', e', T').

        All interior (ghost-free) arrays; with axis_names (inside
        shard_map) the linear solves are distributed (RadSolve.H:171's
        Hypre-over-MPI analog).

        AMR composite plumbing (reference Radiation level solves +
        deferred sync, Radiation.cpp:247-289, RadSolve levelFluxReg):
        - bc_override=(bvl, bvh): Dirichlet Er on the (window) boundary
          faces, interpolated from the coarse level, replacing the
          domain BCs;
        - rhs_extra: deferred-sync source added to the linear system rhs
          (the accumulated coarse-fine flux mismatch, scaled);
        - keep_flux: additionally return the face diffusion fluxes
          F_d = -D dEr/dxd (cell-registered, face i-1/2 at i) for the
          flux registers."""
        cl = self.c
        a_r = self.arad
        if bc_override is not None:
            dim = Er.ndim
            bc_lo = bc_hi = ("dirichlet",) * dim
            spec_lo = [("value_arr", v) for v in bc_override[0]]
            spec_hi = [("value_arr", v) for v in bc_override[1]]
        else:
            bc_lo, bc_hi, spec_lo, spec_hi = self._bc()
        rtol = 1e-10 if Er.dtype == jnp.float64 else 1e-6

        def outer(carry, _):
            Er_k, e_k = carry
            if eos_re is not None:
                # exact T(e) through the EOS (reference internal_energy_
                # update Newton); essential for strongly nonlinear cv(T)
                es_k = eos_re(e_k)
                T_k = jnp.maximum(es_k.T, 1e-10)
                cv_k = jnp.maximum(es_k.cv, 1e-300)
            else:
                T_k = T_guess + (e_k - e) / cv  # local linearization
                T_k = jnp.maximum(T_k, 1e-10)
                cv_k = cv
            kp = self.kappa_p(rho, T_k)
            bcoefs, lam = self.diffusion_coeffs(Er_k, rho, T_k, axis_names)
            bvl, bvh = self._bc_vals(spec_lo, spec_hi, bcoefs)

            beta = 4.0 * a_r * T_k**3 / (rho * cv_k)
            eta = beta * kp * cl * dt / (1.0 + beta * kp * cl * dt)

            # (1 + (1-eta) kp c dt) Er - dt div(D grad Er) =
            #    Er^- + (1-eta) kp c dt a T_k^4_lin + eta (e-term)
            # linearized emission: a T(e_k)^4 ~ aT_k^4 (iterated)
            acoef = 1.0 + (1.0 - eta) * kp * cl * dt
            # energy-limited emission: a cell cannot emit more than its
            # internal energy over the step (the linearized a T^4 source
            # otherwise overdraws cold sharp fronts; the same S appears in
            # the matter debit below, so the cap is exactly conservative)
            fac = (1.0 - eta) * kp * cl * dt
            S_emit = jnp.minimum(a_r * T_k**4,
                                 rho * e / jnp.maximum(fac, 1e-300))
            rhs = Er + fac * S_emit
            if rhs_extra is not None:
                rhs = rhs + rhs_extra
            Er_new, res = mg.solve(
                rhs, self.geom.dx, acoef=acoef, bcoefs=bcoefs,
                alpha=1.0, beta=dt, bc_lo=bc_lo, bc_hi=bc_hi,
                bc_vals_lo=bvl, bc_vals_hi=bvh, n_vcycles=40, rtol=rtol,
                axis_names=axis_names, metric=metric)
            # matter update (internal_energy_update): eta-damped exchange
            # with the same capped emission source (exact pairing with the
            # Er equation => discrete energy conservation)
            de = -dt * kp * cl * (S_emit - Er_new) / rho
            e_new = e + de / (1.0 + beta * kp * cl * dt)
            # residual positivity safeguard (conservative: deficit drawn
            # from the local radiation field)
            e_pos = jnp.maximum(e_new, 1e-300)
            Er_new = jnp.maximum(Er_new - rho * (e_pos - e_new), 0.0)
            e_new = e_pos
            return (Er_new, e_new), res

        (Er_f, e_f), _ = jax.lax.scan(outer, (Er, e), None,
                                      length=self.outer_iters)
        if eos_re is not None:
            T_f = jnp.maximum(eos_re(e_f).T, 1e-10)
        else:
            T_f = jnp.maximum(T_guess + (e_f - e) / cv, 1e-10)
        if keep_flux:
            # face diffusion fluxes of the converged field (RadSolve
            # levelFlux analog): F_d = -D (Er_i - Er_{i-1}) / dx_d,
            # cell-registered (interior faces only; boundary faces unused
            # by the window flux registers)
            bcoefs, _ = self.diffusion_coeffs(Er_f, rho, T_f, axis_names)
            fluxes = []
            for d in range(Er_f.ndim):
                n = Er_f.shape[d]
                lo = Er_f[mg._take(Er_f, d, 0, n - 1)]
                hi = Er_f[mg._take(Er_f, d, 1, n)]
                grad = (hi - lo) / self.geom.dx[d]
                Din = bcoefs[d][mg._take(bcoefs[d], d, 1, n)]
                F = jnp.zeros_like(Er_f)
                F = F.at[mg._take(F, d, 1, n)].set(-Din * grad)
                fluxes.append(F)
            return Er_f, e_f, T_f, fluxes
        return Er_f, e_f, T_f

    def multigroup_update(self, Er_g, rho, e, T_guess, cv, dt, nu_centers,
                          dnu, axis_names=None, eos_re=None, metric=None,
                          rhs_extra=None, bc_override=None, keep_flux=False):
        """MGFLD-style update (reference MGFLD_implicit_update): outer
        matter-coupling iteration; all group diffusion solves vmapped into
        one batched multigrid program. Frequency-dependent opacities,
        per-group Dirichlet boundary values (self.bc_group_vals_lo/hi set
        by the problem, e.g. the hot-sphere Planck spectrum in RadSphere),
        and a curvilinear metric are supported. Er_g: [ngroups, ...].

        AMR plumbing (reference HypreMultiABec multilevel MGFLD solves,
        MGFLDRadSolver.cpp:21-120): bc_override = (bvl_g, bvh_g), tuples
        of per-dim Dirichlet face arrays with a LEADING GROUP AXIS
        (coarse-Er window boundary data); keep_flux additionally returns
        the per-group face diffusion fluxes for the radiation flux
        registers."""
        cl = self.c
        a_r = self.arad
        bc_lo, bc_hi, spec_lo, spec_hi = self._bc()
        ng = Er_g.shape[0]
        rtol = 1e-10 if Er_g.dtype == jnp.float64 else 1e-6
        dim = Er_g.ndim - 1
        if bc_override is not None:
            bc_lo = bc_hi = ("dirichlet",) * dim
            ovl, ovh = (tuple(bc_override[0]), tuple(bc_override[1]))
        else:
            # dummies for the vmap signature (never read)
            z = jnp.zeros((ng,) + (1,) * (dim - 1), Er_g.dtype)
            ovl = ovh = (z,) * dim

        shape_nu = (ng,) + (1,) * dim
        # group structure in the WORKING dtype: an f64 nugroup (built under
        # x64) otherwise promotes the emission terms and breaks the f32
        # scan carry (and silently computes the f32 production path in f64)
        nu_centers = jnp.asarray(nu_centers, Er_g.dtype)
        dnu = jnp.asarray(dnu, Er_g.dtype)
        nu_c = nu_centers.reshape(shape_nu)
        # per-group boundary Dirichlet values (scalars), when registered
        gv_lo = getattr(self, "bc_group_vals_lo", None)
        gv_hi = getattr(self, "bc_group_vals_hi", None)

        def planck_frac(T):
            """Fraction of a T^4 in each group (normalized Planck weights)."""
            x = (C.hplanck / C.k_B) * nu_c / jnp.maximum(T, 1e-10)
            w = x**3 / jnp.expm1(jnp.clip(x, 1e-6, 80.0))
            w = w * dnu.reshape(shape_nu)
            return w / jnp.maximum(jnp.sum(w, axis=0), 1e-300)

        def emission(T):
            """Per-group emission energy density S_g and dS_g/dT
            (default: Planck split of a T^4; problems may override with
            `self.emissivity_fn(T, nu_centers, dnu) -> (S_g, dSdT_g)` —
            the reference's problem_emissivity hook, e.g.
            RadShestakovBolstad's linearized-in-T picket-fence source)."""
            fn = getattr(self, "emissivity_fn", None)
            if fn is not None:
                return fn(T, nu_centers, dnu)
            frac = planck_frac(T)
            S_g = (a_r * T**4)[None] * frac
            dSdT_g = (4.0 * a_r * T**3)[None] * frac
            return S_g, dSdT_g

        def solve_group(rhs, acoef, bcoefs, val_lo, val_hi, ovl_g, ovh_g):
            """One group's diffusion solve; vmapped over groups."""
            if bc_override is not None:
                bvl, bvh = list(ovl_g), list(ovh_g)
            else:
                bvl, bvh = self._bc_vals(spec_lo, spec_hi, bcoefs,
                                         vlo_g=val_lo, vhi_g=val_hi)
            out, _ = mg.solve(
                rhs, self.geom.dx, acoef=acoef, bcoefs=bcoefs,
                alpha=1.0, beta=dt, bc_lo=bc_lo, bc_hi=bc_hi,
                bc_vals_lo=bvl, bc_vals_hi=bvh, n_vcycles=15, rtol=rtol,
                axis_names=axis_names, metric=metric)
            return out

        vsolve = jax.vmap(solve_group, in_axes=(0, 0, 0, 0, 0, 0, 0))

        def outer(carry, _):
            Er_k, e_k = carry
            if eos_re is not None:
                es_k = eos_re(e_k)
                T_k = jnp.maximum(es_k.T, 1e-10)
                cv_k = jnp.maximum(es_k.cv, 1e-300)
            else:
                T_k = jnp.maximum(T_guess + (e_k - e) / cv, 1e-10)
                cv_k = cv
            S_g, dSdT_g = emission(T_k)
            kp_g = jax.vmap(lambda nu: self.kappa_p(rho, T_k, nu))(nu_centers)
            kr_gg = jax.vmap(lambda nu: self.kappa_r(rho, T_k, nu))(nu_centers)
            # constant opacities collapse to one scalar per group
            if kp_g.ndim == 1:
                kp_g = jnp.broadcast_to(kp_g.reshape(shape_nu),
                                        (ng,) + rho.shape)
            if kr_gg.ndim == 1:
                kr_gg = jnp.broadcast_to(kr_gg.reshape(shape_nu),
                                         (ng,) + rho.shape)
            # beta_kp = sum_g kp_g dS_g/dT / (rho cv): the matter-coupling
            # stiffness (reduces to 4 a_r T^3 kp_bar/(rho cv) for the
            # default Planck emission)
            beta_kp = jnp.sum(kp_g * dSdT_g, axis=0) / (rho * cv_k)
            eta = beta_kp * cl * dt / (1.0 + beta_kp * cl * dt)

            bcoefs_g = jax.vmap(
                lambda E1, kr1: tuple(self.diffusion_coeffs(
                    E1, rho, T_k, axis_names, kr=kr1)[0]),
                in_axes=(0, 0))(Er_k, kr_gg)

            acoef_g = 1.0 + (1.0 - eta)[None] * kp_g * cl * dt
            rhs_g = Er_g + (1.0 - eta)[None] * kp_g * cl * dt * S_g
            if rhs_extra is not None:
                # per-group external radiation source (the reference's
                # problem_rad_source hook, e.g. RadSuOlsonMG's qn pulse)
                rhs_g = rhs_g + rhs_extra
            zval = jnp.zeros((ng,), Er_g.dtype)
            vlo = gv_lo if gv_lo is not None else zval
            vhi = gv_hi if gv_hi is not None else zval
            Er_new = vsolve(rhs_g, acoef_g, bcoefs_g, vlo, vhi, ovl, ovh)

            # NOTE on the reference's gray_accel (MGFLD.cpp:441): that
            # scheme accelerates an outer iteration whose group solves lag
            # the matter temperature linearization. Here each group solve
            # is already eta-linearized against the matter coupling, so
            # the outer iteration converges geometrically without it
            # (measured: 4 iterations reach the 40-iteration answer to
            # 1e-9 in the strong-coupling regime — see
            # test_radiation.py::test_multigroup_outer_converges_fast).
            # radiation.accelerate is accepted for input compatibility.

            de = -dt * cl * jnp.sum(
                kp_g * (S_g - Er_new), axis=0) / rho
            e_new = e + de / (1.0 + beta_kp * cl * dt)
            # pin the carry to the working dtype: strongly-typed f64
            # opacity/emissivity constants (built under x64) must not
            # promote an f32 run's solution arrays
            return (Er_new.astype(Er_g.dtype), e_new.astype(e.dtype)), 0.0

        (Er_f, e_f), _ = jax.lax.scan(outer, (Er_g, e), None,
                                      length=self.outer_iters)
        if eos_re is not None:
            T_f = jnp.maximum(eos_re(e_f).T, 1e-10)
        else:
            T_f = jnp.maximum(T_guess + (e_f - e) / cv, 1e-10)
        if keep_flux:
            # per-group face diffusion fluxes of the converged field
            # (RadSolve levelFlux per group; cell-registered interior
            # faces, same convention as the gray branch)
            kr_gf = jax.vmap(lambda nu: self.kappa_r(rho, T_f, nu))(
                nu_centers)
            if kr_gf.ndim == 1:
                kr_gf = jnp.broadcast_to(kr_gf.reshape(shape_nu),
                                         (ng,) + rho.shape)

            def gflux(E1, kr1):
                bco = self.diffusion_coeffs(E1, rho, T_f, axis_names,
                                            kr=kr1)[0]
                fl = []
                for d in range(E1.ndim):
                    n = E1.shape[d]
                    lo = E1[mg._take(E1, d, 0, n - 1)]
                    hi = E1[mg._take(E1, d, 1, n)]
                    grad = (hi - lo) / self.geom.dx[d]
                    Din = bco[d][mg._take(bco[d], d, 1, n)]
                    F = jnp.zeros_like(E1)
                    F = F.at[mg._take(F, d, 1, n)].set(-Din * grad)
                    fl.append(F)
                return tuple(fl)

            fluxes_g = jax.vmap(gflux)(Er_f, kr_gf)
            return Er_f, e_f, T_f, list(fluxes_g)
        return Er_f, e_f, T_f

    def level_fluxes(self, Er, rho, T):
        """Face diffusion fluxes of a (global) field, cell-registered
        (face i-1/2 @ i, interior faces [1, n]; face 0 zero — the domain
        boundary plane, unused by window flux registers). Gray Er [n...]
        or multigroup [ngroups, n...]. Identical convention to the
        keep_flux returns of gray_update/multigroup_update; used by the
        DISTRIBUTED AMR radiation path, where the fluxes are re-derived
        from the globally-sharded converged field (whole-array ops — XLA
        inserts the halo collectives) instead of inside the shard_map
        (reference RadSolve::levelFluxReg, Radiation.cpp:247-289)."""
        gray = Er.ndim == rho.ndim

        def one(E1, kr1):
            bco = self.diffusion_coeffs(E1, rho, T, kr=kr1)[0]
            fl = []
            for d in range(E1.ndim):
                n = E1.shape[d]
                lo = E1[mg._take(E1, d, 0, n - 1)]
                hi = E1[mg._take(E1, d, 1, n)]
                grad = (hi - lo) / self.geom.dx[d]
                Din = bco[d][mg._take(bco[d], d, 1, n)]
                F = jnp.zeros_like(E1)
                F = F.at[mg._take(F, d, 1, n)].set(-Din * grad)
                fl.append(F)
            return tuple(fl)

        if gray:
            kr = self.kappa_r(rho, jnp.maximum(T, 1e-10))
            return list(one(Er, kr))
        kr_g = jax.vmap(lambda nu: self.kappa_r(rho, T, nu))(self.nugroup)
        if kr_g.ndim == 1:
            kr_g = jnp.broadcast_to(
                kr_g.reshape((Er.shape[0],) + (1,) * rho.ndim),
                Er.shape)
        return list(jax.vmap(one)(Er, kr_g))

    def boundary_fluxes(self, Er, rho, T, bvl, bvh):
        """Diffusion fluxes ON the (window) boundary faces given Dirichlet
        face values (bvl, bvh): F = -D (Er_first - bc) / (dx/2) at the lo
        face (outward-positive convention follows the face normal).
        Returns per-dim (F_lo_plane, F_hi_plane), shaped like one face
        plane (axis d size 1). Used by the AMR radiation flux registers
        (reference RadSolve::levelFluxReg)."""
        bcoefs, _ = self.diffusion_coeffs(Er, rho, T)
        out = []
        for d in range(Er.ndim):
            n = Er.shape[d]
            h = self.geom.dx[d]
            D_lo = bcoefs[d][mg._take(bcoefs[d], d, 0, 1)]
            D_hi = bcoefs[d][mg._take(bcoefs[d], d, n, n + 1)]
            E_first = Er[mg._take(Er, d, 0, 1)]
            E_last = Er[mg._take(Er, d, n - 1, n)]
            F_lo = -D_lo * (E_first - bvl[d]) / (0.5 * h)
            F_hi = -D_hi * (bvh[d] - E_last) / (0.5 * h)
            out.append((F_lo, F_hi))
        return out

    def estdt(self, Er, rho, e, cv, T):
        """Radiation dt limiter (reference Radiation::EstTimeStep): limit
        relative change of Er by coupling; diffusion itself is implicit."""
        kp = self.kappa_p(rho, T)
        rate = kp * self.c * jnp.abs(self.arad * T**4 - Er)
        tau = jnp.min(jnp.maximum(Er, rho * e) / jnp.maximum(rate, 1e-300))
        return 0.5 * tau
