"""Halo exchange over the TPU device mesh.

TPU-native replacement for AMReX `FillBoundary`/`FillPatch` MPI halo
exchange (reference `Docs/source/software.rst:202-233`, SURVEY.md P1/P2):
inside `shard_map`, each shard grows its local block by ng ghost cells,
receives neighbor edge slabs via `lax.ppermute` (collective-permute rides
the ICI torus), and applies physical BCs on shards that own a domain edge.

Periodic domain BCs fall out of the wraparound permute for free; other BCs
overwrite the wrapped values on the edge shards only.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from castro_tpu.ops.fill import INTERIOR, bc_ghost_values


def _take(u, axis, lo, hi):
    idx = [slice(None)] * u.ndim
    idx[axis] = slice(lo, hi)
    return tuple(idx)


def exchange_and_fill(u_loc, layout, ng: int,
                      axis_names: Sequence[Optional[str]],
                      lo_bc, hi_bc, odd_components=None,
                      problem_fill=None, t=0.0):
    """Grow a local (ghost-free) block by ng and fill all ghosts.

    u_loc: [NVAR, n1_loc, ...] local shard WITHOUT ghosts.
    axis_names[d]: mesh axis name sharding spatial dim d, or None.
    Must run inside shard_map over those axes.
    """
    dim = layout.dim
    pads = [(0, 0)] + [(ng, ng)] * dim
    u = jnp.pad(u_loc, pads)

    for d in range(dim):
        axis = u.ndim - dim + d
        n = u.shape[axis] - 2 * ng
        name = axis_names[d]
        if name is None:
            from castro_tpu.ops.fill import bc_fill_side

            u = bc_fill_side(u, layout, d, "lo", lo_bc[d], ng, odd_components)
            u = bc_fill_side(u, layout, d, "hi", hi_bc[d], ng, odd_components)
            continue

        m = lax.axis_size(name)
        idx = lax.axis_index(name)

        # my lowest/highest interior slabs
        lo_slab = u[_take(u, axis, ng, 2 * ng)]
        hi_slab = u[_take(u, axis, n, n + ng)]

        # ring permutes (wraparound => periodic for free)
        fwd = [(i, (i + 1) % m) for i in range(m)]
        bwd = [(i, (i - 1) % m) for i in range(m)]
        from_left = lax.ppermute(hi_slab, name, fwd)  # left nbr's hi -> my lo ghosts
        from_right = lax.ppermute(lo_slab, name, bwd)  # right nbr's lo -> my hi ghosts

        u = u.at[_take(u, axis, 0, ng)].set(from_left)
        u = u.at[_take(u, axis, n + ng, n + 2 * ng)].set(from_right)

        # physical BC overwrite on edge shards (non-periodic only)
        if lo_bc[d] != INTERIOR:
            vals = bc_ghost_values(u, layout, d, "lo", lo_bc[d], ng, odd_components)
            cur = u[_take(u, axis, 0, ng)]
            u = u.at[_take(u, axis, 0, ng)].set(jnp.where(idx == 0, vals, cur))
        if hi_bc[d] != INTERIOR:
            vals = bc_ghost_values(u, layout, d, "hi", hi_bc[d], ng, odd_components)
            cur = u[_take(u, axis, n + ng, n + 2 * ng)]
            u = u.at[_take(u, axis, n + ng, n + 2 * ng)].set(
                jnp.where(idx == m - 1, vals, cur))

    from castro_tpu.ops.fill import apply_problem_fill

    return apply_problem_fill(u, problem_fill, t)


def exchange_face(b_loc, dim: int, ng: int,
                  axis_names: Sequence[Optional[str]],
                  lo_bc, hi_bc):
    """Grow a local face-centered field (face i-1/2 registered at cell i,
    the MHD B-field convention) by ng and fill its ghosts: ring-permute
    halo exchange + physical clamp/wrap on domain-edge shards (the
    distributed `filfc.f90` analog; matches MhdSolver._fill_b semantics —
    periodic wrap for bc==0, edge clamp otherwise).

    Face registration makes this IDENTICAL in communication pattern to a
    cell field: the shared shard-boundary face is owned by the right
    shard's cell 0 and mirrored into the left shard's ghost ring.
    """
    b = jnp.pad(b_loc, [(ng, ng)] * dim)

    for d in range(dim):
        n = b.shape[d] - 2 * ng
        name = axis_names[d]

        if name is None:
            if lo_bc[d] == 0:  # periodic
                b = b.at[_take(b, d, 0, ng)].set(b[_take(b, d, n, n + ng)])
                b = b.at[_take(b, d, n + ng, n + 2 * ng)].set(
                    b[_take(b, d, ng, 2 * ng)])
            else:  # clamp
                b = b.at[_take(b, d, 0, ng)].set(jnp.broadcast_to(
                    b[_take(b, d, ng, ng + 1)],
                    b[_take(b, d, 0, ng)].shape))
                b = b.at[_take(b, d, n + ng, n + 2 * ng)].set(
                    jnp.broadcast_to(b[_take(b, d, n + ng - 1, n + ng)],
                                     b[_take(b, d, n + ng, n + 2 * ng)].shape))
            continue

        m = lax.axis_size(name)
        idx = lax.axis_index(name)
        lo_slab = b[_take(b, d, ng, 2 * ng)]
        hi_slab = b[_take(b, d, n, n + ng)]
        fwd = [(i, (i + 1) % m) for i in range(m)]
        bwd = [(i, (i - 1) % m) for i in range(m)]
        from_left = lax.ppermute(hi_slab, name, fwd)
        from_right = lax.ppermute(lo_slab, name, bwd)
        b = b.at[_take(b, d, 0, ng)].set(from_left)
        b = b.at[_take(b, d, n + ng, n + 2 * ng)].set(from_right)

        if lo_bc[d] != 0:
            clamp = jnp.broadcast_to(b[_take(b, d, ng, ng + 1)],
                                     b[_take(b, d, 0, ng)].shape)
            cur = b[_take(b, d, 0, ng)]
            b = b.at[_take(b, d, 0, ng)].set(
                jnp.where(idx == 0, clamp, cur))
        if hi_bc[d] != 0:
            clamp = jnp.broadcast_to(b[_take(b, d, n + ng - 1, n + ng)],
                                     b[_take(b, d, n + ng, n + 2 * ng)].shape)
            cur = b[_take(b, d, n + ng, n + 2 * ng)]
            b = b.at[_take(b, d, n + ng, n + 2 * ng)].set(
                jnp.where(idx == m - 1, clamp, cur))
    return b


def shrink(u, ng: int, dim: int):
    """Drop the ghost margin: inverse of the pad in exchange_and_fill."""
    idx = (slice(None),) * (u.ndim - dim) + (slice(ng, -ng),) * dim
    return u[idx]
