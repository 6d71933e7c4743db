"""Physical boundary-condition ghost fill.

Reference behavior: AMReX FillPatch physical BCs + `ca_statefill`
(`Source/problems/Castro_bc_fill_nd.cpp:11-180`): Interior(0)/periodic,
Inflow(1) via problem hook, Outflow(2) first-order extrapolation,
Symmetry(3)/SlipWall(4) mirror + odd normal velocity, NoSlipWall(5) mirror +
all velocities odd. HSE and ambient fills (`hse_fill.cpp`, `ambient_fill.cpp`)
are provided as problem-level fill hooks.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp

# AMReX phys_bc integer codes
INTERIOR, INFLOW, OUTFLOW, SYMMETRY, SLIPWALL, NOSLIPWALL = 0, 1, 2, 3, 4, 5


def _axis_for(u: jnp.ndarray, dim: int, d: int) -> int:
    return u.ndim - dim + d


def fill_ghosts(
    u: jnp.ndarray,
    layout,
    lo_bc: Sequence[int],
    hi_bc: Sequence[int],
    ng: int,
    odd_components: Optional[dict] = None,
    problem_fill: Optional[Callable] = None,
) -> jnp.ndarray:
    """Fill ng ghost cells on every face of a component-major grown array.

    odd_components: {direction d: tuple(component indices whose sign flips
    under reflection in d)} — for the conserved state this is the normal
    momentum; pass custom maps for primitive/other arrays.
    """
    dim = layout.dim
    if odd_components is None:
        odd_components = {d: (layout.momentum_index(d),) for d in range(dim)}

    for d in range(dim):
        axis = _axis_for(u, dim, d)
        n = u.shape[axis] - 2 * ng

        def take(lo, hi):
            idx = [slice(None)] * u.ndim
            idx[axis] = slice(lo, hi)
            return tuple(idx)

        for side, bc in (("lo", lo_bc[d]), ("hi", hi_bc[d])):
            ghost = take(0, ng) if side == "lo" else take(n + ng, n + 2 * ng)
            if bc == INTERIOR:  # periodic
                src = take(n, n + ng) if side == "lo" else take(ng, 2 * ng)
                u = u.at[ghost].set(u[src])
            elif bc == OUTFLOW or bc == INFLOW:
                # zero-gradient clamp; INFLOW refined by problem_fill below
                src = take(ng, ng + 1) if side == "lo" else take(n + ng - 1, n + ng)
                u = u.at[ghost].set(jnp.broadcast_to(u[src], u[ghost].shape))
            elif bc in (SYMMETRY, SLIPWALL, NOSLIPWALL):
                src = take(ng, 2 * ng) if side == "lo" else take(n, n + ng)
                mirror = jnp.flip(u[src], axis=axis)
                u = u.at[ghost].set(mirror)
                flips = odd_components.get(d, ())
                if bc == NOSLIPWALL:
                    flips = tuple(
                        set(flips)
                        | {layout.momentum_index(k) for k in range(dim)}
                    )
                for comp in flips:
                    if comp < 0:
                        continue
                    cidx = list(ghost)
                    cidx[0] = comp
                    u = u.at[tuple(cidx)].multiply(-1.0)
            else:
                raise ValueError(f"unsupported BC code {bc}")

    if problem_fill is not None:
        u = problem_fill(u)
    return u


def prim_odd_components(layout):
    """Reflection-odd components for the primitive array."""
    return {d: (layout.velocity_index(d),) for d in range(layout.dim)}
