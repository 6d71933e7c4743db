"""SDC time-integration modes.

- Simplified SDC (castro.time_integration_method=3): iterate {advective
  update from the reaction-informed state; full-dt burn with the
  piecewise-constant advective source inside the integrator} (reference
  `Castro_react.cpp:239-480` + `create_source_corrector`,
  `Castro.cpp:3780-3836`).
- True SDC (time_integration_method=2): sdc_order=2 Gauss-Lobatto
  trapezoid node update, and sdc_order=4 three-node Gauss-Lobatto/
  Simpson with 4th-order MOL advection (reference `Source/sdc/
  Castro_sdc.cpp` ca_sdc_update_o2_lobatto / o4_lobatto; the Radau
  quadrature variant is not implemented — Lobatto is the reference
  default).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from castro_tpu.integrators.stiff import make_burner
from castro_tpu.ops.advection_util import ctoprim
from castro_tpu.ops.mol import mol_hydro


class SimplifiedSDC:
    """Full-dt burns with advective forcing, 2 SDC iterations."""

    def __init__(self, sim, n_iters=2):
        self.sim = sim
        ip = sim.params.integrator
        self.burner = make_burner(
            sim.network, sim.eos,
            rtol=max(ip.rtol_spec, ip.rtol_enuc),
            atol_x=ip.atol_spec, atol_e=ip.atol_enuc,
            with_forcing=True)
        self.n_iters = n_iters

    def advance(self, u, dt, t, advective_fn):
        """advective_fn(u) -> A(U) [NVAR, grown] (hydro + non-reacting
        sources). Returns (u_new, burn_fail)."""
        sim = self.sim
        L = sim.layout
        fail = jnp.asarray(False)
        u_k = u
        for _ in range(self.n_iters):
            A = advective_fn(u_k)
            rho0 = u[L.URHO]
            rho1 = jnp.maximum(rho0 + dt * A[L.URHO], sim.cfg.small_dens)
            # advective forcing in primitive burn variables
            xn0 = u[L.UFS:L.UFS + L.nspec] / rho0[None]
            e0 = u[L.UEINT] / rho0
            xf = (A[L.UFS:L.UFS + L.nspec] - xn0 * A[L.URHO][None]) / rho0[None]
            ef = (A[L.UEINT] - e0 * A[L.URHO]) / rho0
            xn1, e1, bf = self.burner(rho0, u[L.UTEMP], xn0, e0, dt,
                                      xdot_force=xf, edot_force=ef)
            fail = fail | jnp.any(bf)
            # assemble U^{k+1}: conserved update for rho/mom/E from A,
            # species and internal energy from the coupled burn
            u_k = u + dt * A
            u_k = u_k.at[L.URHO].set(rho1)
            u_k = u_k.at[L.UFS:L.UFS + L.nspec].set(rho1[None] * xn1)
            de_react = rho1 * e1 - (u[L.UEINT] + dt * A[L.UEINT])
            u_k = u_k.at[L.UEINT].set(rho1 * e1)
            u_k = u_k.at[L.UEDEN].add(de_react)
        return u_k, fail


class TrueSDC4:
    """4th-order true SDC: 3 Gauss-Lobatto nodes {0, 1/2, 1}, Simpson
    quadrature, 4th-order finite-volume MOL advection at the nodes
    (reference `ca_sdc_update_advection_o4_lobatto`, sdc_util.cpp:70-110,
    + fourth_order.cpp), sdc_order iterations. Reactive runs solve the
    node reaction coupling with the forcing-coupled burner (the
    reference's sdc_solve Newton analog)."""

    def __init__(self, sim, n_iters=None):
        self.sim = sim
        self.n_iters = n_iters or max(int(sim.params.castro.sdc_order), 2)
        if sim.network.reactive:
            ip = sim.params.integrator
            self.burner = make_burner(
                sim.network, sim.eos,
                rtol=max(ip.rtol_spec, ip.rtol_enuc),
                atol_x=ip.atol_spec, atol_e=ip.atol_enuc,
                with_forcing=True)
        else:
            self.burner = None

    def _adv(self, u, want_flux=False, ctx=None):
        from castro_tpu.ops.fourth_order import mol4_hydro

        sim = self.sim
        u = ctx.fill(u, 0.0) if ctx is not None else sim._fill(u)
        adv, fluxes, _ = mol4_hydro(u, sim.geom, sim.layout, sim.cfg,
                                    sim.eos,
                                    max(sim.params.castro.small_temp,
                                        1e-200))
        if want_flux:
            return adv, fluxes
        return adv

    def _react_rate(self, u):
        sim = self.sim
        L = sim.layout
        if not sim.network.reactive:
            return jnp.zeros_like(u)
        rho = jnp.maximum(u[L.URHO], sim.cfg.small_dens)
        xn = u[L.UFS:L.UFS + L.nspec] / rho[None]
        e = u[L.UEINT] / rho
        es = sim.eos.re(rho=rho, e=e, xn=xn)
        xdot, edot = sim.network.rhs(rho, es.T, xn, e)
        R = jnp.zeros_like(u)
        R = R.at[L.UFS:L.UFS + L.nspec].set(rho[None] * xdot)
        R = R.at[L.UEINT].set(rho * edot)
        R = R.at[L.UEDEN].set(rho * edot)
        return R

    def _node_react(self, u_start, Aeff, dt_m, fail):
        """Implicit reaction coupling over one node interval: burn from
        u_start with the effective advective forcing Aeff."""
        sim = self.sim
        L = sim.layout
        if self.burner is None:
            return u_start + dt_m * Aeff, fail
        rho0 = jnp.maximum(u_start[L.URHO], sim.cfg.small_dens)
        xn0 = u_start[L.UFS:L.UFS + L.nspec] / rho0[None]
        e0 = u_start[L.UEINT] / rho0
        xf = (Aeff[L.UFS:L.UFS + L.nspec]
              - xn0 * Aeff[L.URHO][None]) / rho0[None]
        ef = (Aeff[L.UEINT] - e0 * Aeff[L.URHO]) / rho0
        xn1, e1, bf = self.burner(rho0, u_start[L.UTEMP], xn0, e0, dt_m,
                                  xdot_force=xf, edot_force=ef)
        fail = fail | jnp.any(bf)
        u1 = u_start + dt_m * Aeff
        rho1 = jnp.maximum(u1[L.URHO], sim.cfg.small_dens)
        de = rho1 * e1 - u1[L.UEINT]
        u1 = u1.at[L.UFS:L.UFS + L.nspec].set(rho1[None] * xn1)
        u1 = u1.at[L.UEINT].set(rho1 * e1)
        u1 = u1.at[L.UEDEN].add(de)
        return u1, fail

    def advance(self, u, dt, t, keep_fluxes=False, ctx=None):
        """One SDC-4 step (k[m] = node states). Returns (u_new, fail)
        [, fluxes] — keep_fluxes additionally returns the Simpson
        time-average of the node hydro fluxes (per-dim, grown grid) for
        the AMR flux registers (reference: SDC advances fill the same
        flux MultiFabs as CTU, Castro_advance_sdc.cpp:180-210).
        `ctx`: shard-local step context (halo-exchange fills) for runs
        under shard_map."""
        sim = self.sim
        fail = jnp.asarray(False)
        hdt = 0.5 * dt

        # initialize all nodes to U^n and the node advection terms.
        # Reactions are NOT added to the node function evaluations: the
        # per-interval burner integrates them implicitly (no double count;
        # same coupling design as TrueSDC2). Non-reactive runs recover the
        # reference's pure ca_sdc_update_advection_o4_lobatto exactly.
        A0, Fu = self._adv(u, want_flux=True, ctx=ctx)
        k = [u, u, u]
        A_old = [A0, A0, A0]
        F_old = [Fu, Fu, Fu]
        F_m0 = F_m1 = Fu
        F_prev = F_old

        for _ in range(self.n_iters):
            F_prev = F_old
            # node 0 -> 1 (dt_m = dt/2), Simpson over [0, 1/2]:
            # quad = dt/24 (5 A0 + 8 A1 - A2)
            A_m0, F_m0 = self._adv(k[0], want_flux=True, ctx=ctx)
            quad01 = dt / 24.0 * (5.0 * A_old[0] + 8.0 * A_old[1]
                                  - A_old[2])
            Aeff = (hdt * (A_m0 - A_old[0]) + quad01) / hdt
            k1, fail = self._node_react(k[0], Aeff, hdt, fail)
            k[1] = sim._clean_fill_impl(k1, ctx)

            # node 1 -> 2: quad = dt/24 (-A0 + 8 A1 + 5 A2)
            A_m1, F_m1 = self._adv(k[1], want_flux=True, ctx=ctx)
            quad12 = dt / 24.0 * (-A_old[0] + 8.0 * A_old[1]
                                  + 5.0 * A_old[2])
            Aeff = (hdt * (A_m1 - A_old[1]) + quad12) / hdt
            k2, fail = self._node_react(k[1], Aeff, hdt, fail)
            k[2] = sim._clean_fill_impl(k2, ctx)

            A_m2, F_m2 = self._adv(k[2], want_flux=True, ctx=ctx)
            A_old = [A_m0, A_m1, A_m2]
            F_old = [F_m0, F_m1, F_m2]

        if keep_fluxes:
            # EXACT flux form of the final state: mirror the last sweep's
            # Aeff combination (quadrature of the PREVIOUS sweep's node
            # fluxes + the finite-sweep defect terms) so the AMR reflux
            # conserves to round-off even when the SDC iteration has not
            # fully converged
            fluxes = [0.5 * (F_m0[d] - F_prev[0][d])
                      + 0.5 * (F_m1[d] - F_prev[1][d])
                      + (F_prev[0][d] + 4.0 * F_prev[1][d]
                         + F_prev[2][d]) / 6.0
                      for d in range(sim.layout.dim)]
            return k[2], fail, fluxes
        return k[2], fail


class TrueSDC2:
    """2nd-order Gauss-Lobatto SDC: nodes {t^n, t^{n+1}}, trapezoid
    quadrature, MOL advection, implicit reactions at the second node."""

    def __init__(self, sim, n_iters=2):
        self.sim = sim
        self.n_iters = n_iters
        if sim.network.reactive:
            ip = sim.params.integrator
            self.burner = make_burner(
                sim.network, sim.eos,
                rtol=max(ip.rtol_spec, ip.rtol_enuc),
                atol_x=ip.atol_spec, atol_e=ip.atol_enuc,
                with_forcing=True)
        else:
            self.burner = None

    def _adv(self, u, want_flux=False, ctx=None):
        sim = self.sim
        L = sim.layout
        u = ctx.fill(u, 0.0) if ctx is not None else sim._fill(u)
        q, qaux = ctoprim(u, L, sim.eos, sim.cfg.small_dens,
                          max(sim.params.castro.small_temp, 1e-200))
        adv, fluxes, _ = mol_hydro(u, q, qaux, 0.0, sim.geom, L, sim.cfg)
        if want_flux:
            return adv, fluxes
        return adv

    def _react_rate(self, u):
        sim = self.sim
        L = sim.layout
        if not sim.network.reactive:
            return jnp.zeros_like(u)
        rho = jnp.maximum(u[L.URHO], sim.cfg.small_dens)
        xn = u[L.UFS:L.UFS + L.nspec] / rho[None]
        e = u[L.UEINT] / rho
        es = sim.eos.re(rho=rho, e=e, xn=xn)
        xdot, edot = sim.network.rhs(rho, es.T, xn, e)
        R = jnp.zeros_like(u)
        R = R.at[L.UFS:L.UFS + L.nspec].set(rho[None] * xdot)
        R = R.at[L.UEINT].set(rho * edot)
        R = R.at[L.UEDEN].set(rho * edot)
        return R

    def advance(self, u, dt, t, keep_fluxes=False, ctx=None):
        """One SDC-2 step. Returns (u_new, fail)[, fluxes] — keep_fluxes
        adds the trapezoid time-average of the node fluxes for the AMR
        flux registers. `ctx`: shard-local context for shard_map runs."""
        sim = self.sim
        fail = jnp.asarray(False)
        A0, F0 = self._adv(u, want_flux=True, ctx=ctx)
        R0 = self._react_rate(u)
        u1 = u + dt * (A0 + R0)  # provisional (forward Euler predictor)
        u1 = sim._clean_fill_impl(u1, ctx)
        F1 = F0
        for _ in range(self.n_iters):
            A1, F1 = self._adv(u1, want_flux=True, ctx=ctx)
            R1 = self._react_rate(u1)
            # trapezoid node update: U^1 = U^0 + dt/2 (A0+A1) + dt/2 (R0+R1);
            # with reactions the R1 piece solved implicitly via a burn with
            # the time-averaged advective forcing
            if self.burner is not None:
                L = sim.layout
                Aavg = 0.5 * (A0 + A1)
                rho0 = u[L.URHO]
                xn0 = u[L.UFS:L.UFS + L.nspec] / rho0[None]
                e0 = u[L.UEINT] / rho0
                xf = (Aavg[L.UFS:L.UFS + L.nspec] - xn0 * Aavg[L.URHO][None]) / rho0[None]
                ef = (Aavg[L.UEINT] - e0 * Aavg[L.URHO]) / rho0
                xn1, e1, bf = self.burner(rho0, u[L.UTEMP], xn0, e0, dt,
                                          xdot_force=xf, edot_force=ef)
                fail = fail | jnp.any(bf)
                u1 = u + dt * Aavg
                rho1 = jnp.maximum(u1[L.URHO], sim.cfg.small_dens)
                de = rho1 * e1 - u1[L.UEINT]
                u1 = u1.at[L.UFS:L.UFS + L.nspec].set(rho1[None] * xn1)
                u1 = u1.at[L.UEINT].set(rho1 * e1)
                u1 = u1.at[L.UEDEN].add(de)
            else:
                u1 = u + 0.5 * dt * (A0 + A1)
            u1 = sim._clean_fill_impl(u1, ctx)
        if keep_fluxes:
            fluxes = [0.5 * (F0[d] + F1[d])
                      for d in range(sim.layout.dim)]
            return u1, fail, fluxes
        return u1, fail


class TrueSDC4Radau(TrueSDC4):
    """4th-order true SDC on Radau IIA nodes (castro.sdc_quadrature=1):
    4 time nodes {0, (4-sqrt(6))/10, (4+sqrt(6))/10, 1} with the exact
    Radau quadrature weights of `ca_sdc_update_advection_o4_radau`
    (sdc_util.cpp:113-166). Right-biased nodes give L-stable implicit
    node reactions — the reference's preferred choice for stiff burns."""

    SQ6 = math.sqrt(6.0)
    # node positions c_m in [0, 1]
    NODES = (0.0, (4.0 - SQ6) / 10.0, (4.0 + SQ6) / 10.0, 1.0)
    # quadrature weights: row m gives dt * sum_j W[m][j] * A_j_old for the
    # integral over [c_m, c_{m+1}] (A_0_old never enters — Radau property)
    W = (
        ((-35.0 * SQ6 + 440.0) / 1800.0, (-169.0 * SQ6 + 296.0) / 1800.0,
         (-16.0 + 24.0 * SQ6) / 1800.0),
        ((-12.0 + 17.0 * SQ6) / 150.0, (12.0 + 17.0 * SQ6) / 150.0,
         (-4.0 * SQ6) / 150.0),
        ((168.0 - 73.0 * SQ6) / 600.0, (120.0 + 5.0 * SQ6) / 600.0,
         (72.0 + 8.0 * SQ6) / 600.0),
    )

    def advance(self, u, dt, t, keep_fluxes=False, ctx=None):
        sim = self.sim
        fail = jnp.asarray(False)
        c = self.NODES
        A0, Fu = self._adv(u, want_flux=True, ctx=ctx)
        k = [u, u, u, u]
        A_old = [A0, A0, A0, A0]
        F_old = [Fu, Fu, Fu, Fu]
        F_prev = F_old
        F_used = [Fu, Fu, Fu]

        for _ in range(self.n_iters):
            F_prev = F_old
            a0n, f0n = self._adv(k[0], want_flux=True, ctx=ctx)
            A_new = [a0n]
            F_new = [f0n]
            F_used = []
            for m in range(3):
                dt_m = (c[m + 1] - c[m]) * dt
                quad = dt * sum(w * A_old[j + 1]
                                for j, w in enumerate(self.W[m]))
                Aeff = (dt_m * (A_new[m] - A_old[m]) + quad) / dt_m
                F_used.append(F_new[m])
                kn, fail = self._node_react(k[m], Aeff, dt_m, fail)
                k[m + 1] = sim._clean_fill_impl(kn, ctx)
                a_n, f_n = self._adv(k[m + 1], want_flux=True, ctx=ctx)
                A_new.append(a_n)
                F_new.append(f_n)
            A_old = A_new
            F_old = F_new

        if keep_fluxes:
            # exact flux form of the last sweep (defect terms + Radau
            # quadrature of the previous sweep's node fluxes) — see the
            # Lobatto variant for why exactness matters for AMR reflux
            dim = sim.layout.dim
            fluxes = []
            for d in range(dim):
                tot = 0.0
                for m in range(3):
                    dt_m = (c[m + 1] - c[m]) * dt
                    tot = tot + dt_m * (F_used[m][d] - F_prev[m][d])
                    tot = tot + dt * sum(
                        w * F_prev[j + 1][d]
                        for j, w in enumerate(self.W[m]))
                fluxes.append(tot / dt)
            return k[3], fail, fluxes
        return k[3], fail
