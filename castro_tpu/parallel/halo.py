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


def _face_edge_vals(b, d, dim, ng, lo, hi, df):
    """Physical-BC ghost slabs for one axis of a face field on a
    domain-EDGE shard, with the full `filfc.f90` parities
    (`ops/fill.py:fill_face`): wall = odd mirror about the wall face on
    the normal axis (hi wall face pinned 0), even mirror tangentially
    (sign-flipped for no-slip), outflow/inflow clamp.  The local grown
    array on an edge shard is structurally identical to a single-device
    grown array along that axis, so the single-device index maps apply
    verbatim; callers slice out only the side their shard owns.
    Returns (lo_slab, hi_slab)."""
    import numpy as np

    from castro_tpu.ops.fill import (NOSLIPWALL, _axis_fill_index,
                                     _face_fill_index_normal)

    N = b.shape[d]
    n = N - 2 * ng
    if df == d:
        idx_map, sgn = _face_fill_index_normal(N, ng, lo, hi)
    else:
        idx_map = _axis_fill_index(N, ng, lo, hi)
        sgn = np.ones(N)
        if lo == NOSLIPWALL:
            sgn[:ng] = -1.0
        if hi == NOSLIPWALL:
            sgn[n + ng:] = -1.0
    filled = jnp.take(b, jnp.asarray(idx_map), axis=d)
    if not np.all(sgn == 1.0):
        shape = [1] * dim
        shape[d] = N
        filled = filled * jnp.asarray(sgn.reshape(shape), b.dtype)
    return filled[_take(b, d, 0, ng)], filled[_take(b, d, n + ng, N)]


def exchange_face(b_loc, dim: int, ng: int,
                  axis_names: Sequence[Optional[str]],
                  lo_bc, hi_bc, df=None):
    """Grow a local face-centered field (face i-1/2 registered at cell i,
    the MHD B-field convention) by ng and fill its ghosts: ring-permute
    halo exchange + physical BCs on domain-edge shards (the distributed
    `filfc.f90` analog).

    `df` = the field's face-normal direction enables the full filfc
    parities at non-periodic edges (wall-odd normal about the wall face,
    tangential even except no-slip; `df=-1` = cell-represented passive
    component, tangential semantics in every dim — matching the
    single-device `MhdSolver._fill_b`). `df=None` keeps the plain edge
    clamp (cell fields like Er, where clamp matches `_fill_rad`'s
    'edge' mode).

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
            elif df is not None:
                lo_v, hi_v = _face_edge_vals(b, d, dim, ng, lo_bc[d],
                                             hi_bc[d], df)
                b = b.at[_take(b, d, 0, ng)].set(lo_v)
                b = b.at[_take(b, d, n + ng, n + 2 * ng)].set(hi_v)
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

        if lo_bc[d] != 0 or hi_bc[d] != 0:
            if df is not None:
                lo_v, hi_v = _face_edge_vals(b, d, dim, ng, lo_bc[d],
                                             hi_bc[d], df)
            else:
                lo_v = jnp.broadcast_to(b[_take(b, d, ng, ng + 1)],
                                        b[_take(b, d, 0, ng)].shape)
                hi_v = jnp.broadcast_to(b[_take(b, d, n + ng - 1, n + ng)],
                                        b[_take(b, d, n + ng, n + 2 * ng)].shape)
        if lo_bc[d] != 0:
            cur = b[_take(b, d, 0, ng)]
            b = b.at[_take(b, d, 0, ng)].set(
                jnp.where(idx == 0, lo_v, cur))
        if hi_bc[d] != 0:
            cur = b[_take(b, d, n + ng, n + 2 * ng)]
            b = b.at[_take(b, d, n + ng, n + 2 * ng)].set(
                jnp.where(idx == m - 1, hi_v, cur))
    return b


def shrink(u, ng: int, dim: int):
    """Drop the ghost margin: inverse of the pad in exchange_and_fill."""
    idx = (slice(None),) * (u.ndim - dim) + (slice(ng, -ng),) * dim
    return u[idx]
