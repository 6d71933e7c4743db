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

    def react(self, u, dt, shk: Optional[jnp.ndarray] = None):
        """Burn every (gated) zone for dt. Returns (u_new, omega_dot, enuc_rate, fail_any)."""
        L = self.layout
        c = self.params.castro
        rho = u[L.URHO]
        T = u[L.UTEMP]
        e = u[L.UEINT] / rho
        xn = u[L.UFS : L.UFS + L.nspec] / rho[None]

        ok = (T >= c.react_T_min) & (T <= c.react_T_max) & \
             (rho >= c.react_rho_min) & (rho <= c.react_rho_max)
        if c.disable_shock_burning and shk is not None:
            ok = ok & (shk == 0.0)

        xn_new, e_new, fail = self.burner(rho, T, xn, e, dt)
        fail = fail & ok

        xn_out = jnp.where(ok[None], xn_new, xn)
        e_out = jnp.where(ok, e_new, e)

        omega_dot = (xn_out - xn) / dt
        enuc = (e_out - e) / dt  # erg/g/s

        u = u.at[L.UFS : L.UFS + L.nspec].set(rho[None] * xn_out)
        de = rho * (e_out - e)
        u = u.at[L.UEINT].add(de)
        u = u.at[L.UEDEN].add(de)
        return u, omega_dot, enuc, jnp.any(fail)
