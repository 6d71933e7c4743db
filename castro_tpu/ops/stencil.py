"""Shifted-view stencil helpers.

Design note (TPU-first): every intermediate field in the hydro pipeline keeps
the FULL grown shape `[..., nx+2g, ny+2g, nz+2g]`; a stencil access `a[i+off]`
is a same-shape `shifted` view (slice + edge-clamp pad). Values within
`|off|` cells of the array edge are garbage-by-construction, exactly like the
unfilled ghost margin of the reference's grown FABs — the CTU chain's total
reach is <= NUM_GROW=4 so the interior is always valid
(reference ghost budget: `Source/driver/Castro_setup.cpp:310-326`).

Keeping shapes static and uniform lets XLA fuse the whole chain without
re-tiling, and maps 1:1 onto Pallas block programs later.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def shifted(a: jnp.ndarray, off: int, axis: int) -> jnp.ndarray:
    """Return b with b[..., i, ...] = a[..., i+off, ...] (edge-clamped)."""
    if off == 0:
        return a
    n = a.shape[axis]
    if n == 1:
        # broadcast (metric) axis: constant along this axis, shift is a no-op
        return a
    k = abs(off)
    if k >= n:
        raise ValueError(f"shift {off} exceeds axis size {n}")
    if off > 0:
        core = lax.slice_in_dim(a, k, n, axis=axis)
        edge = lax.slice_in_dim(a, n - 1, n, axis=axis)
        pad = edge if k == 1 else jnp.repeat(edge, k, axis=axis)
        return jnp.concatenate([core, pad], axis=axis)
    else:
        core = lax.slice_in_dim(a, 0, n - k, axis=axis)
        edge = lax.slice_in_dim(a, 0, 1, axis=axis)
        pad = edge if k == 1 else jnp.repeat(edge, k, axis=axis)
        return jnp.concatenate([pad, core], axis=axis)


def diff_plus(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    """a[i+1] - a[i]."""
    return shifted(a, 1, axis) - a


def diff_minus(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    """a[i] - a[i-1]."""
    return a - shifted(a, -1, axis)


def avg_to_face(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    """0.5*(a[i-1] + a[i]) — face value at i-1/2 stored at i."""
    return 0.5 * (a + shifted(a, -1, axis))


def interior_slice(ng: int, dim: int, comp_ndim: int = 1):
    """Slicer selecting the valid interior of a grown array."""
    return (slice(None),) * comp_ndim + (slice(ng, -ng),) * dim


def set_interior(full: jnp.ndarray, interior: jnp.ndarray, ng: int, dim: int) -> jnp.ndarray:
    """Write `interior` into the interior region of `full`."""
    idx = (slice(None),) * (full.ndim - dim) + (slice(ng, -ng),) * dim
    return full.at[idx].set(interior)
