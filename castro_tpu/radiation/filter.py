"""Purser (1987) spatial filters for radiation quantities (reference
`Source/radiation/filter.H` ff1..ff4 and the `filter_lambda_T` /
`filter_prim_T` plumbing in `Radiation.cpp:53-136`): symmetric
(2T+1)-point low-pass stencils of degree S that remove grid-scale
odd-even noise from the flux limiter (and optionally the primitives in
rad-hydro) while preserving polynomials up to degree 2S+1.

Coefficients are the S=0 members (the reference default: filter_*_S=0);
stencils are applied along each spatial axis with edge-clamped ghosts —
the reference's one-sided boundary variants reduce to this for the
smooth near-boundary fields the filter targets."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# half-stencils [w0, w1, ..., wT] (Purser 1987 Table 1 / filter.H, S=0)
_HALF = {
    1: np.array([0.50, 0.25]),
    2: np.array([0.625, 0.25, -0.0625]),
    3: np.array([44.0, 15.0, -6.0, 1.0]) / 64.0,
    4: np.array([186.0, 56.0, -28.0, 8.0, -1.0]) / 256.0,
}


def filter_kernel(T: int) -> np.ndarray:
    """Full symmetric (2T+1)-point kernel for filter order T in 1..4."""
    h = _HALF[int(T)]
    return np.concatenate([h[:0:-1], h])


def apply_filter(field, T: int, axes=None):
    """Filter `field` along the given spatial axes (default: all axes).
    T=0 is a no-op.  Edge handling: clamp (replicate boundary cells)."""
    if T <= 0:
        return field
    k = jnp.asarray(filter_kernel(T), dtype=field.dtype)
    t = int(T)
    axes = range(field.ndim) if axes is None else axes
    out = field
    for ax in axes:
        pads = [(0, 0)] * out.ndim
        pads[ax] = (t, t)
        g = jnp.pad(out, pads, mode="edge")
        acc = jnp.zeros_like(out)
        n = out.shape[ax]
        for j in range(2 * t + 1):
            sl = [slice(None)] * out.ndim
            sl[ax] = slice(j, j + n)
            acc = acc + k[j] * g[tuple(sl)]
        out = acc
    return out
