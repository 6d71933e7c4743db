"""Inter-level operators for AMR: conservative prolongation (FillPatch /
FillCoarsePatch interpolation), restriction (avgDown), and face-flux
coarsening for refluxing.

Reference semantics: AMReX CellConservativeLinear interpolater (used by
Castro's StateData descriptors), `average_down`, and
`FluxRegister::CrseInit/FineAdd/Reflux` (`Source/driver/Castro.cpp:2549-2700`).
All ops here are dense whole-array transforms (ratio 2).
"""

from __future__ import annotations

import jax.numpy as jnp

from castro_tpu.ops.stencil import shifted


def _mc_slope(c, ax):
    """Monotonized-central limited slope (per coarse cell)."""
    dl = c - shifted(c, -1, ax)
    dr = shifted(c, 1, ax) - c
    dc = 0.5 * (dl + dr)
    s = jnp.sign(dc)
    mag = jnp.minimum(jnp.abs(dc), 2.0 * jnp.minimum(jnp.abs(dl), jnp.abs(dr)))
    return jnp.where(dl * dr > 0.0, s * mag, 0.0)


def prolong(c, dim, comp_axes=1, conservative=True):
    """Coarse -> fine (ratio 2), limited-linear, mean-preserving.

    c: [..., n1, n2, ...] with `comp_axes` leading non-spatial axes.
    fine child values: c + sum_d (+-1/4) slope_d with ALL slopes limited on
    the coarse field (like AMReX CellConservativeLinear). Computing every
    slope from the coarse data — rather than nesting per-dimension passes —
    keeps the operator symmetric under axis exchange (the nested variant
    breaks transpose symmetry when limiters fire)."""
    slopes = ([_mc_slope(c, comp_axes + d) for d in range(dim)]
              if conservative else None)
    out = c
    for d in range(dim):
        ax = comp_axes + d
        if conservative:
            sl = slopes[d]
            lo = out - 0.25 * sl
            hi = out + 0.25 * sl
        else:
            lo = hi = out
        st = jnp.stack([lo, hi], axis=ax + 1)
        shape = st.shape[:ax] + (2 * out.shape[ax],) + st.shape[ax + 2:]
        out = st.reshape(shape)
        if conservative:
            # upsample the not-yet-applied slopes along this axis
            for k in range(d + 1, dim):
                slopes[k] = jnp.repeat(slopes[k], 2, axis=ax)
    return out


def restrict(f, dim, comp_axes=1):
    """Fine -> coarse volume average (reference avgDown; Cartesian)."""
    out = f
    for d in range(dim):
        ax = comp_axes + d
        n = out.shape[ax]
        shape = out.shape[:ax] + (n // 2, 2) + out.shape[ax + 1:]
        out = out.reshape(shape).mean(axis=ax + 1)
    return out


def restrict_mask(m, dim):
    """Coarsen a boolean mask: coarse cell covered iff ALL children covered."""
    out = m
    for d in range(dim):
        n = out.shape[d]
        shape = out.shape[:d] + (n // 2, 2) + out.shape[d + 1:]
        out = out.reshape(shape).all(axis=d + 1)
    return out


def prolong_mask(m, dim):
    out = m
    for d in range(dim):
        out = jnp.repeat(out, 2, axis=d)
    return out


def prolong_face(bc, d, dim):
    """Divergence-free face prolongation (ratio 2) of one face field.

    bc: coarse face array, face I-1/2 @ index I, with n+1 entries along
    the normal d (the caller slices one extra hi face from the grown
    coarse field) and n entries along each transverse axis. Fine faces on
    coarse face planes (even fine index 2I) copy the coarse value,
    constant over the 2^(dim-1) transverse children; the mid-plane fine
    face (odd index) is the mean of the two bracketing coarse faces. With
    all dim fields prolonged this way, every fine-cell divergence equals
    the parent coarse-cell divergence — exactly zero stays exactly zero
    (the CT analog of AMReX face_divfree interpolation; reference MHD
    fillpatch, `Source/mhd/Castro_mhd.cpp` StateData Mag_Type_*).

    Returns the fine face array with 2n entries along every axis (fine
    face 2n is dropped — the @index convention stores faces 0..2n-1)."""
    lo_sl = [slice(None)] * bc.ndim
    lo_sl[d] = slice(0, -1)
    hi_sl = [slice(None)] * bc.ndim
    hi_sl[d] = slice(1, None)
    lo = bc[tuple(lo_sl)]
    mid = 0.5 * (lo + bc[tuple(hi_sl)])
    out = jnp.stack([lo, mid], axis=d + 1)
    shape = out.shape[:d] + (2 * lo.shape[d],) + out.shape[d + 2:]
    out = out.reshape(shape)
    for k in range(dim):
        if k != d:
            out = jnp.repeat(out, 2, axis=k)
    return out


def restrict_face(bf, d, dim):
    """Fine -> coarse face restriction: coarse face I-1/2 @ I is the area
    mean of its 2^(dim-1) fine subfaces (even subsample along the normal,
    pair-mean transverse). The adjoint of `prolong_face`; preserves
    divergence-free exactly (coarse div = mean of fine divs)."""
    idx = [slice(None)] * bf.ndim
    idx[d] = slice(0, None, 2)
    out = bf[tuple(idx)]
    for k in range(dim):
        if k == d:
            continue
        n = out.shape[k]
        shape = out.shape[:k] + (n // 2, 2) + out.shape[k + 1:]
        out = out.reshape(shape).mean(axis=k + 1)
    return out


def restrict_edge(E, k, dim):
    """Edge-EMF restriction for the CT flux register (Balsara-style EMF
    averaging at coarse-fine boundaries): E_k lives on k-directed edges
    at (a1-1/2, a2-1/2) @ (i_a1, i_a2), cell-centered along k. Coarse
    edges coincide with even fine edge indices in the transverse (a1, a2)
    axes; along k a coarse edge is the mean of the 2 fine edges composing
    it. In 2D (k out of plane) it is a pure corner subsample."""
    idx = [slice(None)] * E.ndim
    for a in range(dim):
        if a != k:
            idx[a] = slice(0, None, 2)
    out = E[tuple(idx)]
    if k < dim:
        n = out.shape[k]
        shape = out.shape[:k] + (n // 2, 2) + out.shape[k + 1:]
        out = out.reshape(shape).mean(axis=k + 1)
    return out


def coarsen_flux(F, d, dim, comp_axes=1):
    """Coarsen a face-registered flux-density array along direction d.

    F: [..., nf...] fine interior FACE array with nf+1... here F is the
    full-length face-registered array (face i = i-1/2) restricted to the
    fine interior: shape nf along every axis, face index i in [0, nf-1]
    valid (the nf-th face is obtained by shifting before the call if
    needed). Coarse face i aligns with fine face 2i; transverse dims are
    averaged in pairs (flux densities; Cartesian areas uniform)."""
    out = F
    ax_d = comp_axes + d
    idx = [slice(None)] * out.ndim
    idx[ax_d] = slice(0, None, 2)
    out = out[tuple(idx)]
    for k in range(dim):
        if k == d:
            continue
        ax = comp_axes + k
        n = out.shape[ax]
        shape = out.shape[:ax] + (n // 2, 2) + out.shape[ax + 1:]
        out = out.reshape(shape).mean(axis=ax + 1)
    return out
