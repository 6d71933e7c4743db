"""Batched stiff ODE integrator for reaction networks.

TPU-native replacement for the per-zone VODE integrator the reference uses
(`Exec/Make.Castro:52` INTEGRATOR_DIR=VODE; called via `burner(burn_state,
dt)`, `Source/reactions/Castro_react.cpp:123`): instead of one adaptive ODE
object per zone, every zone advances together through a fixed-shape
4th-order Kaps-Rentrop Rosenbrock step (one autodiff Jacobian + one LU,
four linear solves) with per-zone adaptive sub-stepping via masked
`lax.while_loop`. Jacobians come from `jax.jacfwd` of the pointwise RHS —
exact, no hand-coded network Jacobians.

Burn state: y = [X_0..X_{nspec-1}, e]; density is constant over the burn
(matches the reference burn_t)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import lu_factor, lu_solve

# Modified Rosenbrock pair (Shampine & Reichelt, the ode23s scheme):
# L-stable order 2 with a 3rd-order error estimate; one Jacobian + one LU
# shared by 3 solves per step. The system is autonomous.
D = 1.0 / (2.0 + 2.0**0.5)
E32 = 6.0 + 2.0**0.5

SAFETY = 0.9
GROW_MAX = 5.0
SHRINK_MIN = 0.1


def make_burner(network, eos, rtol=1e-6, atol_x=1e-8, atol_e=1e-6,
                max_substeps=1024, with_forcing=False):
    """Returns burn(rho, T, xn, e, dt[, xf, ef]) -> (xn_new, e_new, fail).

    All arrays share the grid shape; xn is [nspec, ...].
    with_forcing: the RHS gains piecewise-constant advective forcing terms
    (simplified-SDC coupling, reference `Castro_react.cpp:239-480`:
    the burn integrates dX/dt = xdot + A_X, de/dt = edot + A_e)."""
    nspec = network.nspec
    ny = nspec + 1

    def rhs_point(y, rho, force=None):
        """Pointwise RHS for one zone (y: [ny], rho: scalar)."""
        xn = jnp.clip(y[:nspec], 0.0, 1.0)
        e = jnp.maximum(y[nspec], 1e-30)
        es = eos.re(rho=rho, e=e, xn=xn)
        xdot, edot = network.rhs(rho, es.T, xn, e)
        out = jnp.concatenate([xdot, edot[None]])
        if force is not None:
            out = out + force
        return out

    jac_point = jax.jacfwd(rhs_point)
    if with_forcing:
        rhs_v = jax.vmap(rhs_point, in_axes=(0, 0, 0))
        jac_v = jax.vmap(jac_point, in_axes=(0, 0, 0))
    else:
        rhs_v0 = jax.vmap(rhs_point, in_axes=(0, 0))
        jac_v0 = jax.vmap(jac_point, in_axes=(0, 0))
        rhs_v = lambda y, rho, force: rhs_v0(y, rho)
        jac_v = lambda y, rho, force: jac_v0(y, rho)

    def rosenbrock_step(y, rho, h, force):
        """One ode23s step, batched: y [nz, ny], rho [nz], h [nz].
        Returns (y_new, err_vec)."""
        f0 = rhs_v(y, rho, force)
        J = jac_v(y, rho, force)
        I = jnp.eye(ny, dtype=y.dtype)
        W = I[None] - (h * D)[:, None, None] * J
        lu, piv = lu_factor(W)

        def solve(b):
            return lu_solve((lu, piv), b[..., None])[..., 0]

        k1 = solve(f0)
        f1 = rhs_v(y + 0.5 * h[:, None] * k1, rho, force)
        k2 = solve(f1 - k1) + k1
        y_new = y + h[:, None] * k2
        f2 = rhs_v(y_new, rho, force)
        k3 = solve(f2 - E32 * (k2 - f1) - 2.0 * (k1 - f0))
        err = (h / 6.0)[:, None] * (k1 - 2.0 * k2 + k3)
        return y_new, err

    def burn(rho, T, xn, e, dt, xdot_force=None, edot_force=None):
        shape = rho.shape
        rho_f = rho.reshape(-1)
        y0 = jnp.concatenate([xn.reshape(nspec, -1), e.reshape(1, -1)], axis=0).T
        if with_forcing:
            force = jnp.concatenate([xdot_force.reshape(nspec, -1),
                                     edot_force.reshape(1, -1)], axis=0).T
        else:
            force = None
        nz = y0.shape[0]
        # derive from rho_f so the carry stays axis-varying under shard_map
        t0 = (rho_f * 0).astype(y0.dtype)
        h0 = t0 + dt / 16.0
        # completion threshold in units of the WORKING dtype's epsilon:
        # with f32 state, t accumulates ~eps_f32 roundoff per substep, so
        # an f64-idiom (1 - 1e-12) margin flags converged zones as failed
        eps = float(jnp.finfo(y0.dtype).eps)
        t_done = dt * (1.0 - 100.0 * eps)

        def cond(state):
            t, h, y, it = state
            return (it < max_substeps) & jnp.any(t < t_done)

        def body(state):
            t, h, y, it = state
            active = t < t_done
            h_eff = jnp.where(active, jnp.minimum(h, dt - t), h)
            y_new, err = rosenbrock_step(y, rho_f, h_eff, force)

            scale = atol_x + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_new))
            scale = scale.at[:, nspec].set(
                atol_e + rtol * jnp.maximum(jnp.abs(y[:, nspec]),
                                            jnp.abs(y_new[:, nspec])))
            enorm = jnp.max(jnp.abs(err) / scale, axis=1)
            ok = (enorm <= 1.0) & jnp.all(jnp.isfinite(y_new), axis=1)

            adv = active & ok
            y = jnp.where(adv[:, None], y_new, y)
            t = jnp.where(adv, t + h_eff, t)

            fac = SAFETY * jnp.where(
                enorm > 0, enorm ** (-1.0 / 3.0), GROW_MAX)
            fac = jnp.clip(fac, SHRINK_MIN, GROW_MAX)
            fac = jnp.where(jnp.isfinite(enorm), fac, SHRINK_MIN)
            h = jnp.where(active, h_eff * fac, h)
            return t, h, y, it + 1

        t, h, y, it = lax.while_loop(cond, body, (t0, h0, y0, 0))
        fail = (t < t_done).reshape(shape)

        xn_new = jnp.clip(y[:, :nspec].T.reshape((nspec,) + shape), 0.0, 1.0)
        ssum = jnp.sum(xn_new, axis=0)
        xn_new = xn_new / jnp.maximum(ssum, 1e-30)[None]
        e_new = y[:, nspec].reshape(shape)
        return xn_new, e_new, fail

    return burn
