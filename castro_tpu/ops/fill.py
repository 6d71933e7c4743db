"""Physical boundary-condition ghost fill.

Reference behavior: AMReX FillPatch physical BCs + `ca_statefill`
(`Source/problems/Castro_bc_fill_nd.cpp:11-180`): Interior(0)/periodic,
Inflow(1) via problem hook, Outflow(2) first-order extrapolation,
Symmetry(3)/SlipWall(4) mirror + odd normal velocity, NoSlipWall(5) mirror +
all velocities odd. HSE and ambient fills (`hse_fill.cpp`, `ambient_fill.cpp`)
are provided as problem-level fill hooks.

The per-side primitives (`bc_fill_side`) are reused by the sharded halo
exchange (`castro_tpu/parallel/halo.py`), where they apply only on shards
that own a physical domain edge.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp

# AMReX phys_bc integer codes
INTERIOR, INFLOW, OUTFLOW, SYMMETRY, SLIPWALL, NOSLIPWALL = 0, 1, 2, 3, 4, 5


def _take(u, axis, lo, hi):
    idx = [slice(None)] * u.ndim
    idx[axis] = slice(lo, hi)
    return tuple(idx)


def bc_ghost_values(u, layout, d: int, side: str, bc: int, ng: int,
                    odd_components: Optional[dict] = None):
    """Compute the ghost-region values for one face (without writing them).

    Returns an array shaped like the ghost slab. For periodic returns the
    wrap values.
    """
    dim = layout.dim
    axis = u.ndim - dim + d
    n = u.shape[axis] - 2 * ng
    if odd_components is None:
        odd_components = {d: (layout.momentum_index(d),) for d in range(dim)}

    if bc == INTERIOR:  # periodic wrap
        src = _take(u, axis, n, n + ng) if side == "lo" else _take(u, axis, ng, 2 * ng)
        return u[src]
    if bc in (OUTFLOW, INFLOW):
        src = _take(u, axis, ng, ng + 1) if side == "lo" else _take(u, axis, n + ng - 1, n + ng)
        ghost_shape = list(u.shape)
        ghost_shape[axis] = ng
        return jnp.broadcast_to(u[src], tuple(ghost_shape))
    if bc in (SYMMETRY, SLIPWALL, NOSLIPWALL):
        src = _take(u, axis, ng, 2 * ng) if side == "lo" else _take(u, axis, n, n + ng)
        mirror = jnp.flip(u[src], axis=axis)
        flips = odd_components.get(d, ())
        if bc == NOSLIPWALL:
            flips = tuple(set(flips) | {layout.momentum_index(k) for k in range(dim)})
        for comp in flips:
            if comp >= 0:
                mirror = mirror.at[comp].multiply(-1.0)
        return mirror
    raise ValueError(f"unsupported BC code {bc}")


def bc_fill_side(u, layout, d: int, side: str, bc: int, ng: int,
                 odd_components: Optional[dict] = None):
    """Fill one face's ghost region in place."""
    dim = layout.dim
    axis = u.ndim - dim + d
    n = u.shape[axis] - 2 * ng
    ghost = _take(u, axis, 0, ng) if side == "lo" else _take(u, axis, n + ng, n + 2 * ng)
    vals = bc_ghost_values(u, layout, d, side, bc, ng, odd_components)
    return u.at[ghost].set(vals)


def _axis_fill_index(N, ng, lo, hi):
    """Ghost→source index map along one grown axis: one gather per axis
    implements wrap (periodic), clamp (outflow/inflow baseline), and
    reflect (symmetry/walls) at once."""
    import numpy as np

    n = N - 2 * ng
    idx = np.arange(N)
    if lo == INTERIOR:
        idx[:ng] = np.arange(n, n + ng)
    elif lo in (OUTFLOW, INFLOW):
        idx[:ng] = ng
    else:  # mirror
        idx[:ng] = np.arange(2 * ng - 1, ng - 1, -1)
    if hi == INTERIOR:
        idx[n + ng:] = np.arange(ng, 2 * ng)
    elif hi in (OUTFLOW, INFLOW):
        idx[n + ng:] = n + ng - 1
    else:
        idx[n + ng:] = np.arange(n + ng - 1, n - 1, -1)
    return idx


def _face_fill_index_normal(N, ng, lo, hi):
    """Ghost index map + parity sign along the face-NORMAL axis of a
    face-registered field (face i-1/2 @ index i; interior faces
    [ng, ng+n-1], the hi domain face ng+n lives in the ghost margin).
    Walls mirror about the wall face with ODD parity (face data carries
    the velocity-like BC the reference assigns to face B / MAC
    velocities) and the hi wall face is pinned to 0; outflow/inflow
    clamp; periodic wraps (face j maps to j -/+ n)."""
    import numpy as np

    n = N - 2 * ng
    idx = np.arange(N)
    sgn = np.ones(N)
    wall = (SYMMETRY, SLIPWALL, NOSLIPWALL)
    for j in range(ng):
        k = ng - 1 - j  # distance below the lo wall face (at index ng)
        if lo == INTERIOR:
            idx[j] = j + n
        elif lo in wall:
            idx[j] = ng + 1 + k
            sgn[j] = -1.0
        else:
            idx[j] = ng
    for j in range(ng + n, N):
        k = j - (ng + n)
        if hi == INTERIOR:
            idx[j] = j - n
        elif hi in wall:
            if k == 0:
                idx[j] = ng + n - 1
                sgn[j] = 0.0  # the wall face itself: no penetration
            else:
                idx[j] = ng + n - k
                sgn[j] = -1.0
        else:
            idx[j] = ng + n - 1
    return idx, sgn


def fill_face(b, df, dim, ng, lo_bc, hi_bc):
    """General face-centered physical-BC fill (reference `filfc.f90`,
    Source/driver/filfc.f90:1-1297, + the face-variable BC records of
    Castro_setup): fill the ghost margin of ONE face field normal to
    `df` (face i-1/2 @ index i, grown array with ng ghosts per side).

    Treatment per boundary dimension d:
      d == df : periodic wrap / outflow clamp / wall = odd mirror about
                the wall FACE with the hi wall face pinned to 0
                (velocity-like normal component);
      d != df : cell-registered along d — periodic/clamp/even mirror
                (SYMMETRY and SLIPWALL keep tangential face data even;
                NOSLIPWALL flips it, like tangential velocity)."""
    import numpy as np

    for d in range(dim):
        N = b.shape[d]
        n = N - 2 * ng
        lo, hi = lo_bc[d], hi_bc[d]
        if d == df:
            idx, sgn = _face_fill_index_normal(N, ng, lo, hi)
            b = jnp.take(b, jnp.asarray(idx), axis=d)
            if not np.all(sgn == 1.0):
                shape = [1] * dim
                shape[d] = N
                b = b * jnp.asarray(sgn.reshape(shape), b.dtype)
        else:
            idx = _axis_fill_index(N, ng, lo, hi)
            b = jnp.take(b, jnp.asarray(idx), axis=d)
            # tangential face data flips only for no-slip walls
            sv = np.ones(N)
            if lo == NOSLIPWALL:
                sv[:ng] = -1.0
            if hi == NOSLIPWALL:
                sv[n + ng:] = -1.0
            if not np.all(sv == 1.0):
                shape = [1] * dim
                shape[d] = N
                b = b * jnp.asarray(sv.reshape(shape), b.dtype)
    return b


def fill_ghosts(
    u: jnp.ndarray,
    layout,
    lo_bc: Sequence[int],
    hi_bc: Sequence[int],
    ng: int,
    odd_components: Optional[dict] = None,
    problem_fill: Optional[Callable] = None,
    t=0.0,
) -> jnp.ndarray:
    """Fill ng ghost cells on every face of a component-major grown array.

    odd_components: {direction d: components whose sign flips under
    reflection in d} — the normal momentum for the conserved state.

    INFLOW faces get a first-order extrapolation baseline and MUST then be
    overwritten by `problem_fill` (the reference's problem_bc_fill hook,
    `Castro_bc_fill_nd.cpp:11-180`); problem_fill receives (u, t) so
    time-dependent inflow (double Mach reflection) works.

    TPU note: implemented as ONE static gather per axis (wrap/clamp/reflect
    index map) instead of per-face dynamic-update-slices — the slices force
    whole-array copies per face (6 in 3D), ~2x slower end to end.
    """
    import numpy as np

    dim = layout.dim
    if odd_components is None:
        odd_components = {d: (layout.momentum_index(d),) for d in range(dim)}
    wall = (SYMMETRY, SLIPWALL, NOSLIPWALL)
    for d in range(dim):
        axis = u.ndim - dim + d
        N = u.shape[axis]
        n = N - 2 * ng
        lo, hi = lo_bc[d], hi_bc[d]
        idx = _axis_fill_index(N, ng, lo, hi)
        u = jnp.take(u, jnp.asarray(idx), axis=axis)
        # reflection-odd components on wall faces (per side: NoSlipWall
        # flips every velocity, Symmetry/SlipWall only the normal one)
        if lo in wall or hi in wall:
            base = set(odd_components.get(d, ()))
            allv = base | {layout.momentum_index(k) for k in range(dim)}
            flips_lo = (allv if lo == NOSLIPWALL else base) if lo in wall else set()
            flips_hi = (allv if hi == NOSLIPWALL else base) if hi in wall else set()
            shape = [1] * dim
            shape[d] = N
            for comp in sorted(c for c in (flips_lo | flips_hi) if c >= 0):
                sv = np.ones(N)
                if comp in flips_lo:
                    sv[:ng] = -1.0
                if comp in flips_hi:
                    sv[n + ng:] = -1.0
                svj = jnp.asarray(sv.reshape(shape), dtype=u.dtype)
                u = u.at[comp].multiply(svj)
    return apply_problem_fill(u, problem_fill, t)


def apply_problem_fill(u, problem_fill, t):
    if problem_fill is None:
        return u
    import inspect

    try:
        n = len(inspect.signature(problem_fill).parameters)
    except (TypeError, ValueError):
        n = 1
    return problem_fill(u, t) if n >= 2 else problem_fill(u)


def prim_odd_components(layout):
    """Reflection-odd components for the primitive array."""
    return {d: (layout.velocity_index(d),) for d in range(layout.dim)}
