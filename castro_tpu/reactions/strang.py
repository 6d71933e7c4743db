"""Strang-split reaction coupling (reference `Castro::react_state`,
`Source/reactions/Castro_react.cpp:11-235`): half-dt burns before and after
the hydro update; T/rho gating (`react_T_min..react_rho_max`), optional
shock-burning disable; burn changes X and e at constant rho, updating
UEINT/UEDEN/UFS and recording omega_dot + rho_enuc for diagnostics
(Reactions_Type analog)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from castro_tpu.integrators.stiff import make_burner


class StrangReactor:
    def __init__(self, params, network, eos, layout):
        self.params = params
        self.network = network
        self.eos = eos
        self.layout = layout
        ip = params.integrator
        self.burner = make_burner(
            network, eos,
            rtol=max(ip.rtol_spec, ip.rtol_enuc),
            atol_x=ip.atol_spec, atol_e=ip.atol_enuc)
        # NSE bypass (reference nse_tabular coupling: zones past the
        # rho/T thresholds jump straight to the equilibrium composition
        # instead of integrating the stiff network)
        self.nse = None
        if params.network.nse:
            from castro_tpu.network.nse import make_nse_solver

            self.nse = make_nse_solver(network)

    def _apply_nse(self, rho, T, xn, e, xn_new, e_new):
        """Replace the burn result with the NSE composition in zones past
        the thresholds; the energy change is the binding-energy release of
        relaxing to equilibrium (at constant rho, e-from-binding model)."""
        np_ = self.params.network
        L = self.layout
        sh = (-1,) + (1,) * rho.ndim
        zion = jnp.asarray(self.network.zion).reshape(sh)
        aion = jnp.asarray(self.network.aion).reshape(sh)
        ye = jnp.clip(jnp.sum(zion / aion * xn, axis=0), 1e-3, 1.0)
        in_nse = (T >= np_.T_nse) & (rho >= np_.rho_nse)
        in_nse = in_nse | (T >= np_.T_always_nse)
        ebin = jnp.asarray(self.network.ebin).reshape(sh)

        # self-consistent NSE temperature (reference nse_burn's T
        # iteration against the table): find T* where the thermal energy
        # at the equilibrium composition balances the binding-energy
        # release of reaching it,
        #   F(T) = e_eos(rho, T, X_nse(T)) - [e0 + sum ebin (X_nse(T)-x0)]
        # F is monotone in T (e_eos rises; hotter NSE is lighter-bound so
        # the available energy falls), so bisection is unconditionally
        # convergent — a damped fixed point oscillates between the
        # Ni-rich and dissociated branches when the zone cannot afford
        # full dissociation.
        import jax

        def avail(X_T):
            return e + jnp.sum(ebin * (X_T - xn), axis=0)

        def F(T_k):
            X_T = self.nse(rho, T_k, ye)
            e_th = self.eos.rt(rho=rho, T=T_k, xn=X_T).e
            return e_th - avail(X_T)

        T_lo = jnp.full_like(T, 1.0e7)
        T_hi = jnp.full_like(T, 5.0e10)

        def bis(carry, _):
            T_lo, T_hi = carry
            T_m = jnp.sqrt(T_lo * T_hi)  # log-space bisection
            too_hot = F(T_m) > 0.0
            return (jnp.where(too_hot, T_lo, T_m),
                    jnp.where(too_hot, T_m, T_hi)), None

        (T_lo, T_hi), _ = jax.lax.scan(bis, (T_lo, T_hi), None, length=40)
        T_star = jnp.sqrt(T_lo * T_hi)
        X_nse = self.nse(rho, T_star, ye)
        e_nse = jnp.maximum(avail(X_nse), 1e-10)
        xn_out = jnp.where(in_nse[None], X_nse, xn_new)
        e_out = jnp.where(in_nse, e_nse, e_new)
        return xn_out, e_out, in_nse

    def react(self, u, dt, shk: Optional[jnp.ndarray] = None):
        """Burn every (gated) zone for dt. Returns (u_new, omega_dot, enuc_rate, fail_any)."""
        L = self.layout
        c = self.params.castro
        rho = u[L.URHO]
        T = u[L.UTEMP]
        e = u[L.UEINT] / rho
        xn = u[L.UFS : L.UFS + L.nspec] / rho[None]

        # gate sentinels (e.g. react_T_max=1e200) exceed f32 range; clamp
        # to the working dtype's max so the cast cannot overflow to a
        # trace-time warning (comparison semantics are unchanged)
        fmax = float(jnp.finfo(u.dtype).max)
        ok = (T >= c.react_T_min) & (T <= min(c.react_T_max, fmax)) & \
             (rho >= c.react_rho_min) & (rho <= min(c.react_rho_max, fmax))
        if c.disable_shock_burning and shk is not None:
            ok = ok & (shk == 0.0)

        xn_new, e_new, fail = self.burner(rho, T, xn, e, dt)
        fail = fail & ok
        if self.nse is not None:
            xn_new, e_new, in_nse = self._apply_nse(rho, T, xn, e,
                                                    xn_new, e_new)
            fail = fail & ~in_nse  # NSE zones bypass the integrator

        xn_out = jnp.where(ok[None], xn_new, xn)
        e_out = jnp.where(ok, e_new, e)

        omega_dot = (xn_out - xn) / dt
        enuc = (e_out - e) / dt  # erg/g/s

        u = u.at[L.UFS : L.UFS + L.nspec].set(rho[None] * xn_out)
        de = rho * (e_out - e)
        u = u.at[L.UEINT].add(de)
        u = u.at[L.UEDEN].add(de)
        return u, omega_dot, enuc, jnp.any(fail)
