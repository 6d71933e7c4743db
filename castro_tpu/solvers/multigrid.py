"""Matrix-free geometric multigrid for cell-centered elliptic problems.

TPU-native replacement for the reference's linear-solver stack:
- AMReX `MLPoisson`/`MLABecLaplacian` + `MLMG` used for gravity and thermal
  diffusion (`Source/gravity/Gravity.cpp:3500-3558`,
  `Source/diffusion/Diffusion.H:104`)
- Hypre structured solvers used for radiation
  (`Source/radiation/HypreABec.cpp`, `RadSolve.H:171`)

Operator (the general ABec form, matching MLABecLaplacian):

    L(u) = alpha * a(x) * u - beta * div( b(x) grad u )

Design: fixed-depth V-cycles with red-black Gauss-Seidel smoothing, full-
weighting restriction, piecewise-constant prolongation. Everything is
static-shape and branch-free so the entire solve jits into one XLA program;
the cycle count is a static argument (run-to-tolerance loops live on the
host if needed, but a fixed-cycle solve keeps TPU steps synchronous).

BCs per face: 'periodic', 'dirichlet' (value on the domain face, array or
scalar), 'neumann' (zero-gradient). Cell-centered ghost conventions:
dirichlet ghost = 2*f - interior; neumann ghost = interior.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

PERIODIC, DIRICHLET, NEUMANN = 0, 1, 2

_BC_CODE = {"periodic": PERIODIC, "dirichlet": DIRICHLET, "neumann": NEUMANN}


def _take(u, axis, lo, hi):
    idx = [slice(None)] * u.ndim
    idx[axis] = slice(lo, hi)
    return tuple(idx)


def fill_bc(u, bc_lo, bc_hi, bc_vals_lo=None, bc_vals_hi=None):
    """Fill 1 ghost cell per face of a grown array [n1+2, n2+2, ...]."""
    dim = u.ndim
    for d in range(dim):
        n = u.shape[d] - 2
        ghost_lo = _take(u, d, 0, 1)
        ghost_hi = _take(u, d, n + 1, n + 2)
        int_lo = _take(u, d, 1, 2)
        int_hi = _take(u, d, n, n + 1)
        for side, code, ghost, interior, wrap in (
            ("lo", bc_lo[d], ghost_lo, int_lo, _take(u, d, n, n + 1)),
            ("hi", bc_hi[d], ghost_hi, int_hi, _take(u, d, 1, 2)),
        ):
            if code == PERIODIC:
                u = u.at[ghost].set(u[wrap])
            elif code == NEUMANN:
                u = u.at[ghost].set(u[interior])
            else:  # DIRICHLET
                src = bc_vals_lo if side == "lo" else bc_vals_hi
                vals = src[d] if src is not None else None
                if vals is None:
                    vals = 0.0
                elif hasattr(vals, "ndim") and vals.ndim == u.ndim:
                    # face-plane array sized to the interior: edge-pad the
                    # transverse dims to cover the grown ghost slab corners
                    pads = [(0, 0) if k == d else (1, 1) for k in range(u.ndim)]
                    vals = jnp.pad(vals, pads, mode="edge")
                u = u.at[ghost].set(2.0 * vals - u[interior])
    return u


def _grow(u):
    return jnp.pad(u, 1)


def _shrink(u):
    return u[(slice(1, -1),) * u.ndim]


def apply_op(u_g, acoef, bcoefs, alpha, beta, dx):
    """L(u) on the interior given a grown (ghost-filled) u_g.

    bcoefs[d]: face-registered coefficient (interior faces only; array of
    shape like the interior along other dims, n+1 along d) or scalar 1.0.
    """
    dim = u_g.ndim
    u = _shrink(u_g)
    out = alpha * acoef * u if acoef is not None else alpha * u
    for d in range(dim):
        # interior along every dim except d
        v = u_g
        for k in range(dim):
            if k != d:
                v = v[_take(v, k, 1, v.shape[k] - 1)]
        n = v.shape[d] - 2
        c = v[_take(v, d, 1, n + 1)]
        lo = v[_take(v, d, 0, n)]
        hi = v[_take(v, d, 2, n + 2)]
        b = bcoefs[d] if bcoefs is not None else None
        if b is None:
            flux_div = (hi - c) - (c - lo)
        else:
            b_lo = b[_take(b, d, 0, n)]
            b_hi = b[_take(b, d, 1, n + 1)]
            flux_div = b_hi * (hi - c) - b_lo * (c - lo)
        out = out - beta * flux_div / (dx[d] * dx[d])
    return out


def _diag(acoef, bcoefs, alpha, beta, dx, shape, dtype):
    diag = alpha * (acoef if acoef is not None else jnp.ones(shape, dtype))
    for d in range(len(dx)):
        if bcoefs is None or bcoefs[d] is None:
            s = 2.0
            diag = diag + beta * s / (dx[d] * dx[d])
        else:
            b = bcoefs[d]
            n = shape[d]
            b_lo = b[_take(b, d, 0, n)]
            b_hi = b[_take(b, d, 1, n + 1)]
            diag = diag + beta * (b_lo + b_hi) / (dx[d] * dx[d])
    return diag


def _checkerboards(shape):
    idx = sum(np.meshgrid(*[np.arange(n) for n in shape], indexing="ij"))
    red = jnp.asarray((idx % 2) == 0)
    return red, ~red


def _smooth(u, rhs, acoef, bcoefs, alpha, beta, dx, bc_lo, bc_hi,
            bvals_lo, bvals_hi, red, black, n_sweeps):
    """Red-black Gauss-Seidel."""
    diag = _diag(acoef, bcoefs, alpha, beta, dx, rhs.shape, rhs.dtype)
    inv_diag = 1.0 / diag

    def one_color(u, mask):
        u_g = fill_bc(_grow(u), bc_lo, bc_hi, bvals_lo, bvals_hi)
        res = rhs - apply_op(u_g, acoef, bcoefs, alpha, beta, dx)
        return u + jnp.where(mask, res * inv_diag, 0.0)

    for _ in range(n_sweeps):
        u = one_color(u, red)
        u = one_color(u, black)
    return u


def _restrict(r):
    """Full-weighting: average the 2^d fine children of each coarse cell."""
    out = r
    for d in range(r.ndim):
        n = out.shape[d]
        new_shape = out.shape[:d] + (n // 2, 2) + out.shape[d + 1:]
        out = out.reshape(new_shape).mean(axis=d + 1)
    return out


def _take_every2(ndim, d, off):
    idx = [slice(None)] * ndim
    idx[d] = slice(off, None, 2)
    return tuple(idx)


def _prolong(e_c, fine_shape, bc_lo, bc_hi):
    """(Bi/tri)linear cell-centered prolongation: per dim,
    fine[2i] = 3/4 c[i] + 1/4 c[i-1], fine[2i+1] = 3/4 c[i] + 1/4 c[i+1].
    Correction BCs are homogeneous (fill_bc with zero Dirichlet values)."""
    g = fill_bc(_grow(e_c), bc_lo, bc_hi)
    ndim = e_c.ndim
    out = g
    for d in range(ndim):
        c = out[_take(out, d, 1, out.shape[d] - 1)]
        lo = out[_take(out, d, 0, out.shape[d] - 2)]
        hi = out[_take(out, d, 2, out.shape[d])]
        even = 0.75 * c + 0.25 * lo
        odd = 0.75 * c + 0.25 * hi
        st = jnp.stack([even, odd], axis=d + 1)
        new_shape = st.shape[:d] + (2 * c.shape[d],) + st.shape[d + 2:]
        out = st.reshape(new_shape)
    return out


def _coarsen_face_coef(b, d):
    """Coarsen a face-registered coefficient along all axes: sample every
    other face along its own axis, average pairs along the others."""
    if b is None:
        return None
    out = b
    ndim = out.ndim
    for k in range(ndim):
        if k == d:
            out = out[_take_every2(ndim, k, 0)]
        else:
            n = out.shape[k]
            new_shape = out.shape[:k] + (n // 2, 2) + out.shape[k + 1:]
            out = out.reshape(new_shape).mean(axis=k + 1)
    return out


def solve(rhs, dx, *, acoef=None, bcoefs=None, alpha=0.0, beta=1.0,
          bc_lo=("periodic",) * 3, bc_hi=("periodic",) * 3,
          bc_vals_lo=None, bc_vals_hi=None,
          n_vcycles=10, nu1=2, nu2=2, coarse_sweeps=40,
          min_size=4, u0=None):
    """Solve alpha*a*u - beta*div(b grad u) = rhs. Returns (u, residual_norm).

    All arguments static except rhs/coefs/bc values. Fully jit-compatible.
    For the pure-Neumann/periodic Poisson problem the rhs must have zero
    mean (the reference subtracts the same `mass_offset`,
    `Gravity.cpp` rhs setup); the returned u has zero mean there.
    """
    dim = rhs.ndim
    bl = tuple(_BC_CODE[b] for b in bc_lo[:dim])
    bh = tuple(_BC_CODE[b] for b in bc_hi[:dim])
    bvl = list(bc_vals_lo) if bc_vals_lo is not None else [None] * dim
    bvh = list(bc_vals_hi) if bc_vals_hi is not None else [None] * dim

    singular = all(c != DIRICHLET for c in bl + bh) and alpha == 0.0

    # build level hierarchy (static)
    levels = []
    shape = rhs.shape
    ldx = tuple(dx)
    la, lb = acoef, bcoefs
    lvl_bvl, lvl_bvh = bvl, bvh
    while True:
        red, black = _checkerboards(shape)
        levels.append(dict(shape=shape, dx=ldx, acoef=la, bcoefs=lb,
                           red=red, black=black, bvl=lvl_bvl, bvh=lvl_bvh))
        if min(shape) <= min_size or any(n % 2 for n in shape):
            break
        shape = tuple(n // 2 for n in shape)
        ldx = tuple(2 * h for h in ldx)
        la = None if la is None else _restrict(la)
        lb = None if lb is None else [
            _coarsen_face_coef(lb[d], d) for d in range(dim)]
        lvl_bvl = [None] * dim  # homogeneous BCs for correction equations
        lvl_bvh = [None] * dim

    def residual(u, rhs, lv):
        u_g = fill_bc(_grow(u), bl, bh, lv["bvl"], lv["bvh"])
        return rhs - apply_op(u_g, lv["acoef"], lv["bcoefs"], alpha, beta, lv["dx"])

    def _coarse_direct(rhs_c, lv):
        """Exact coarsest solve: materialize the (tiny) dense operator by
        applying it to unit vectors. Essential for nearly-singular
        diffusion-dominated ABec problems, where smoothing barely damps the
        constant mode (the reference relies on MLMG's agglomerated coarse
         'bottom solve' for the same reason)."""
        shape = lv["shape"]
        N = int(np.prod(shape))

        def col(i):
            ei = jnp.zeros((N,), rhs_c.dtype).at[i].set(1.0).reshape(shape)
            e_g = fill_bc(_grow(ei), bl, bh)  # homogeneous coarse BCs
            return apply_op(e_g, lv["acoef"], lv["bcoefs"], alpha, beta,
                            lv["dx"]).reshape(-1)

        A = jax.vmap(col)(jnp.arange(N)).T  # A[:, i] = L(e_i)
        if singular:
            # pin the mean to remove the nullspace
            A = A + jnp.ones((N, N), rhs_c.dtype) / N
        return jnp.linalg.solve(A, rhs_c.reshape(-1)).reshape(shape)

    def vcycle(k, u, rhs):
        lv = levels[k]
        if k == len(levels) - 1:
            N = int(np.prod(lv["shape"]))
            if N <= 1024 and lv["bvl"][0] is None:
                return _coarse_direct(rhs, lv)
            return _smooth(u, rhs, lv["acoef"], lv["bcoefs"], alpha, beta,
                           lv["dx"], bl, bh, lv["bvl"], lv["bvh"],
                           lv["red"], lv["black"], coarse_sweeps)
        u = _smooth(u, rhs, lv["acoef"], lv["bcoefs"], alpha, beta, lv["dx"],
                    bl, bh, lv["bvl"], lv["bvh"], lv["red"], lv["black"], nu1)
        r = residual(u, rhs, lv)
        r_c = _restrict(r)
        e_c = vcycle(k + 1, jnp.zeros_like(r_c), r_c)
        u = u + _prolong(e_c, lv["shape"], bl, bh)
        u = _smooth(u, rhs, lv["acoef"], lv["bcoefs"], alpha, beta, lv["dx"],
                    bl, bh, lv["bvl"], lv["bvh"], lv["red"], lv["black"], nu2)
        return u

    if singular:
        rhs = rhs - jnp.mean(rhs)

    u = jnp.zeros_like(rhs) if u0 is None else u0
    for _ in range(n_vcycles):
        u = vcycle(0, u, rhs)
        if singular:
            u = u - jnp.mean(u)

    res = residual(u, rhs, levels[0])
    rnorm = jnp.max(jnp.abs(res))
    return u, rnorm


def poisson(rhs, dx, **kw):
    """Solve laplacian(u) = rhs (note ABec L = -div grad, so negate).

    This is the gravity-facing entry point: del^2 phi = 4 pi G rho
    (reference `Gravity::solve_phi_with_mlmg`, Gravity.cpp:3465)."""
    u, res = solve(-rhs, dx, alpha=0.0, beta=1.0, **kw)
    return u, res
