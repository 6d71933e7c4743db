"""Matrix-free geometric multigrid for cell-centered elliptic problems.

TPU-native replacement for the reference's linear-solver stack:
- AMReX `MLPoisson`/`MLABecLaplacian` + `MLMG` used for gravity and thermal
  diffusion (`Source/gravity/Gravity.cpp:3500-3558`,
  `Source/diffusion/Diffusion.H:104`)
- Hypre structured solvers used for radiation
  (`Source/radiation/HypreABec.cpp`, `RadSolve.H:171`)

Operator (the general ABec form, matching MLABecLaplacian):

    L(u) = alpha * a(x) * u - beta * div( b(x) grad u )

Design: V-cycles with red-black Gauss-Seidel smoothing, full-weighting
restriction, bilinear prolongation, and a dense direct solve on the
coarsest level. Everything is static-shape and branch-free so the entire
solve jits into one XLA program. Iteration control is a `lax.while_loop`
to a residual tolerance (the reference MLMG iterates to `rel_eps`,
`Gravity.cpp:3542-3558`), so the solve self-terminates on-device.

**Distributed solves** (the MLMG-agglomeration analog, SURVEY.md §2.8 P7):
pass `axis_names` while tracing inside `shard_map` — fine levels smooth
with 1-ghost halo exchange over ICI (`lax.ppermute`); once the local block
is small (or odd), the remaining coarse problem is `all_gather`ed and
solved redundantly on every device, exactly MLMG's bottom-solve
consolidation strategy (`gravity.mlmg_agglomeration`, `_cpp_parameters:726`).

BCs per face: 'periodic', 'dirichlet' (value on the domain face, array or
scalar), 'neumann' (zero-gradient). Cell-centered ghost conventions:
dirichlet ghost = 2*f - interior; neumann ghost = interior.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

PERIODIC, DIRICHLET, NEUMANN, ROBIN = 0, 1, 2, 3

_BC_CODE = {"periodic": PERIODIC, "dirichlet": DIRICHLET,
            "neumann": NEUMANN, "robin": ROBIN}


def _take(u, axis, lo, hi):
    idx = [slice(None)] * u.ndim
    idx[axis] = slice(lo, hi)
    return tuple(idx)


def _pad_face_vals(vals, d, ndim):
    """Edge-pad a face-plane array (interior-sized, size 1 along d) to
    cover the grown ghost slab corners."""
    if vals is None:
        return 0.0
    if hasattr(vals, "ndim") and vals.ndim == ndim:
        pads = [(0, 0) if k == d else (1, 1) for k in range(ndim)]
        return jnp.pad(vals, pads, mode="edge")
    return vals


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
            elif code == ROBIN:
                # ghost = A*interior + G (mixed/Marshak radiation BCs);
                # homogeneous correction levels (vals None) degrade to
                # Neumann — exact in the diffusive (A -> 1) regime
                src = bc_vals_lo if side == "lo" else bc_vals_hi
                vals = src[d] if src is not None else None
                if vals is None:
                    u = u.at[ghost].set(u[interior])
                else:
                    A = _pad_face_vals(vals[0], d, dim)
                    G = _pad_face_vals(vals[1], d, dim)
                    u = u.at[ghost].set(A * u[interior] + G)
            else:  # DIRICHLET
                src = bc_vals_lo if side == "lo" else bc_vals_hi
                vals = _pad_face_vals(src[d] if src is not None else None,
                                      d, dim)
                u = u.at[ghost].set(2.0 * vals - u[interior])
    return u


def sharded_fill_bc(u_loc, bl, bh, axis_names, bc_vals_lo=None,
                    bc_vals_hi=None):
    """Grow a shard-local block by 1 ghost cell and fill: halo exchange via
    ppermute along sharded axes, physical BCs on domain-edge shards, serial
    fill along unsharded axes. Must run inside shard_map."""
    dim = u_loc.ndim
    u = jnp.pad(u_loc, 1)
    for d in range(dim):
        n = u.shape[d] - 2
        name = axis_names[d] if d < len(axis_names) else None
        if name is None:
            # serial fill on this axis only
            for side, code, ghost, interior, wrap in (
                ("lo", bl[d], _take(u, d, 0, 1), _take(u, d, 1, 2),
                 _take(u, d, n, n + 1)),
                ("hi", bh[d], _take(u, d, n + 1, n + 2), _take(u, d, n, n + 1),
                 _take(u, d, 1, 2)),
            ):
                if code == PERIODIC:
                    u = u.at[ghost].set(u[wrap])
                elif code == NEUMANN:
                    u = u.at[ghost].set(u[interior])
                else:
                    src = bc_vals_lo if side == "lo" else bc_vals_hi
                    vals = _pad_face_vals(src[d] if src is not None else None,
                                          d, dim)
                    u = u.at[ghost].set(2.0 * vals - u[interior])
            continue

        m = lax.axis_size(name)
        idx = lax.axis_index(name)
        lo_slab = u[_take(u, d, 1, 2)]
        hi_slab = u[_take(u, d, n, n + 1)]
        fwd = [(j, (j + 1) % m) for j in range(m)]
        bwd = [(j, (j - 1) % m) for j in range(m)]
        from_left = lax.ppermute(hi_slab, name, fwd)
        from_right = lax.ppermute(lo_slab, name, bwd)
        u = u.at[_take(u, d, 0, 1)].set(from_left)
        u = u.at[_take(u, d, n + 1, n + 2)].set(from_right)

        def phys_ghost(code, interior, src):
            if code == NEUMANN:
                return interior
            if code == ROBIN:
                vals = src[d] if src is not None else None
                if vals is None:
                    return interior
                A = _pad_face_vals(vals[0], d, dim)
                G = _pad_face_vals(vals[1], d, dim)
                return A * interior + G
            vals = _pad_face_vals(src[d] if src is not None else None,
                                  d, dim)
            return 2.0 * vals - interior

        if bl[d] != PERIODIC:
            interior = u[_take(u, d, 1, 2)]
            phys = phys_ghost(bl[d], interior, bc_vals_lo)
            cur = u[_take(u, d, 0, 1)]
            u = u.at[_take(u, d, 0, 1)].set(jnp.where(idx == 0, phys, cur))
        if bh[d] != PERIODIC:
            interior = u[_take(u, d, n, n + 1)]
            phys = phys_ghost(bh[d], interior, bc_vals_hi)
            cur = u[_take(u, d, n + 1, n + 2)]
            u = u.at[_take(u, d, n + 1, n + 2)].set(
                jnp.where(idx == m - 1, phys, cur))
    return u


def _grow(u):
    return jnp.pad(u, 1)


def _shrink(u):
    return u[(slice(1, -1),) * u.ndim]


def apply_op(u_g, acoef, bcoefs, alpha, beta, dx, metric=None):
    """L(u) on the interior given a grown (ghost-filled) u_g.

    bcoefs[d]: face-registered coefficient (interior faces only; array of
    shape like the interior along other dims, n+1 along d) or scalar 1.0.
    metric (curvilinear coords): {"areas": [face-registered area per dim],
    "vol": cell volumes} — the divergence becomes
    (1/V) sum_d (A_hi b_hi du_hi - A_lo b_lo du_lo)/dx_d (the MLABec
    operator in general geometry; reference HABEC stencils).
    """
    dim = u_g.ndim
    u = _shrink(u_g)
    out = alpha * acoef * u if acoef is not None else alpha * u
    vinv = 1.0 / metric["vol"] if metric is not None else None
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
        if metric is not None:
            A = metric["areas"][d]
            A_lo = A[_take(A, d, 0, n)]
            A_hi = A[_take(A, d, 1, n + 1)]
        else:
            A_lo = A_hi = None
        if b is None:
            f_lo, f_hi = (c - lo), (hi - c)
        else:
            b_lo = b[_take(b, d, 0, n)]
            b_hi = b[_take(b, d, 1, n + 1)]
            f_lo, f_hi = b_lo * (c - lo), b_hi * (hi - c)
        if A_lo is not None:
            flux_div = (A_hi * f_hi - A_lo * f_lo) * vinv / dx[d]
        else:
            flux_div = (f_hi - f_lo) / (dx[d] * dx[d])
        out = out - beta * flux_div
    return out


def _diag(acoef, bcoefs, alpha, beta, dx, shape, dtype, metric=None):
    diag = alpha * (acoef if acoef is not None else jnp.ones(shape, dtype))
    vinv = 1.0 / metric["vol"] if metric is not None else None
    for d in range(len(dx)):
        b = bcoefs[d] if bcoefs is not None else None
        n = shape[d]
        if b is None:
            b_lo = b_hi = 1.0
        else:
            b_lo = b[_take(b, d, 0, n)]
            b_hi = b[_take(b, d, 1, n + 1)]
        if metric is not None:
            A = metric["areas"][d]
            A_lo = A[_take(A, d, 0, n)]
            A_hi = A[_take(A, d, 1, n + 1)]
            diag = diag + beta * (A_lo * b_lo + A_hi * b_hi) * vinv / dx[d]
        else:
            diag = diag + beta * (b_lo + b_hi) / (dx[d] * dx[d])
    return diag


def _coarsen_metric(metric, dim):
    if metric is None:
        return None
    vol = metric["vol"]
    vol_c = _restrict(vol) * (2 ** dim)
    areas = []
    for d in range(dim):
        A = metric["areas"][d]
        out = A
        for k in range(dim):
            if k == d:
                out = out[_take_every2(out.ndim, k, 0)]
            else:
                n = out.shape[k]
                ns = out.shape[:k] + (n // 2, 2) + out.shape[k + 1:]
                out = out.reshape(ns).sum(axis=k + 1)
        areas.append(out)
    return {"areas": areas, "vol": vol_c}


def _checkerboards(shape):
    idx = sum(np.meshgrid(*[np.arange(n) for n in shape], indexing="ij"))
    red = jnp.asarray((idx % 2) == 0)
    return red, ~red


def _sharded_checkerboards(shape, axis_names):
    """Global-parity red mask for a shard-local block (traced)."""
    dim = len(shape)
    tot = jnp.zeros((1,) * dim, jnp.int32)
    for d in range(dim):
        i = jnp.arange(shape[d], dtype=jnp.int32)
        name = axis_names[d] if d < len(axis_names) else None
        if name is not None:
            i = i + lax.axis_index(name).astype(jnp.int32) * shape[d]
        sh = [1] * dim
        sh[d] = shape[d]
        tot = tot + i.reshape(sh)
    red = (tot % 2) == 0
    return jnp.broadcast_to(red, shape), jnp.broadcast_to(~red, shape)


def _smooth(u, rhs, lv, alpha, beta, n_sweeps):
    """Red-black Gauss-Seidel using the level's fill closure."""
    diag = _diag(lv["acoef"], lv["bcoefs"], alpha, beta, lv["dx"],
                 rhs.shape, rhs.dtype, lv.get("metric"))
    inv_diag = 1.0 / diag

    def one_color(u, mask):
        u_g = lv["fill"](u)
        res = rhs - apply_op(u_g, lv["acoef"], lv["bcoefs"], alpha, beta,
                             lv["dx"], lv.get("metric"))
        return u + jnp.where(mask, res * inv_diag, 0.0)

    for _ in range(n_sweeps):
        u = one_color(u, lv["red"])
        u = one_color(u, lv["black"])
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


def _prolong(e_c, fill):
    """(Bi/tri)linear cell-centered prolongation: per dim,
    fine[2i] = 3/4 c[i] + 1/4 c[i-1], fine[2i+1] = 3/4 c[i] + 1/4 c[i+1].
    `fill` supplies the coarse ghosts (homogeneous correction BCs)."""
    g = fill(e_c)
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


def _gather_full(x, axis_names):
    for d in range(x.ndim):
        name = axis_names[d] if d < len(axis_names) else None
        if name is not None:
            x = lax.all_gather(x, name, axis=d, tiled=True)
    return x


def _slice_local(x, local_shape, axis_names):
    for d in range(x.ndim):
        name = axis_names[d] if d < len(axis_names) else None
        if name is not None:
            start = lax.axis_index(name) * local_shape[d]
            x = lax.dynamic_slice_in_dim(x, start, local_shape[d], axis=d)
    return x


def _gather_face_coef(b, d, axis_names):
    """Gather a face-registered coefficient to the full domain. Along its
    own (sharded) axis the local arrays share their boundary face, so
    gather the lo-faces tiled and append the global last face."""
    if b is None:
        return None
    for k in range(b.ndim):
        name = axis_names[k] if k < len(axis_names) else None
        if name is None:
            continue
        if k == d:
            m = lax.axis_size(name)
            idx = lax.axis_index(name)
            nloc = b.shape[k] - 1
            body = _take(b, k, 0, nloc)
            full = lax.all_gather(b[body], name, axis=k, tiled=True)
            last_loc = b[_take(b, k, nloc, nloc + 1)]
            last = lax.psum(jnp.where(idx == m - 1, last_loc, 0.0), name)
            b = jnp.concatenate([full, last], axis=k)
        else:
            b = lax.all_gather(b, name, axis=k, tiled=True)
    return b


def solve(rhs, dx, *, acoef=None, bcoefs=None, alpha=0.0, beta=1.0,
          bc_lo=("periodic",) * 3, bc_hi=("periodic",) * 3,
          bc_vals_lo=None, bc_vals_hi=None,
          n_vcycles=30, nu1=2, nu2=2, coarse_sweeps=40,
          min_size=4, u0=None, rtol=None, atol=0.0,
          axis_names=None, gather_min=8, metric=None):
    """Solve alpha*a*u - beta*div(b grad u) = rhs. Returns (u, residual_norm).

    Fully jit-compatible. With `rtol` set, V-cycles run in a
    `lax.while_loop` until ||res||_inf <= rtol*||rhs||_inf + atol or
    n_vcycles is hit (the reference MLMG semantics); otherwise exactly
    n_vcycles run. With `axis_names` (inside shard_map), rhs/coefs/u are
    shard-local blocks and the solve is distributed (see module docstring).

    For the pure-Neumann/periodic Poisson problem the rhs must have zero
    mean (the reference subtracts the same `mass_offset`); the returned u
    has zero mean there.
    """
    dim = rhs.ndim
    bl = tuple(_BC_CODE[b] for b in bc_lo[:dim])
    bh = tuple(_BC_CODE[b] for b in bc_hi[:dim])
    bvl = list(bc_vals_lo) if bc_vals_lo is not None else [None] * dim
    bvh = list(bc_vals_hi) if bc_vals_hi is not None else [None] * dim

    names = tuple(axis_names[:dim]) if axis_names else (None,) * dim
    sharded = any(n is not None for n in names)
    assert not (sharded and metric is not None), \
        "curvilinear metric not supported in distributed solves yet"
    spatial = tuple(n for n in names if n is not None)

    if sharded:
        def gsum(x):
            return lax.psum(jnp.sum(x), spatial)

        def gmax(x):
            return lax.pmax(jnp.max(x), spatial)

        n_global = int(np.prod([
            rhs.shape[d] * (lax.axis_size(names[d]) if names[d] else 1)
            for d in range(dim)]))
    else:
        gsum, gmax = jnp.sum, jnp.max
        n_global = int(np.prod(rhs.shape))

    singular = all(c not in (DIRICHLET, ROBIN) for c in bl + bh) \
        and alpha == 0.0

    # ---- build the level hierarchy (static plan) -------------------------
    levels = []
    shape = rhs.shape
    ldx = tuple(dx)
    la, lb = acoef, bcoefs
    lvl_bvl, lvl_bvh = bvl, bvh

    if sharded:
        # distributed levels: halo-exchange fills; coarsen locally while
        # the local block stays even and comfortably sized
        while True:
            _bvl, _bvh = lvl_bvl, lvl_bvh

            def mk_fill(_bvl=_bvl, _bvh=_bvh):
                return lambda v: sharded_fill_bc(v, bl, bh, names, _bvl, _bvh)

            red, black = _sharded_checkerboards(shape, names)
            levels.append(dict(kind="dist", shape=shape, dx=ldx, acoef=la,
                               bcoefs=lb, red=red, black=black,
                               fill=mk_fill()))
            can = (all(n % 2 == 0 for n in shape)
                   and min(shape) // 2 >= max(2, gather_min // 2)
                   and min(shape) > gather_min)
            if not can:
                break
            shape = tuple(n // 2 for n in shape)
            ldx = tuple(2 * h for h in ldx)
            la = None if la is None else _restrict(la)
            lb = None if lb is None else [
                _coarsen_face_coef(lb[d], d) for d in range(dim)]
            lvl_bvl = [None] * dim
            lvl_bvh = [None] * dim

        # gathered (agglomerated) part: the transition restricts locally
        # then all-gathers — requires the last dist level's shape even;
        # otherwise gather at the same resolution (no intermediate restrict)
        last = levels[-1]
        transition_restrict = all(n % 2 == 0 for n in last["shape"]) and \
            min(last["shape"]) >= 2
        if transition_restrict:
            g_shape0 = tuple((last["shape"][d] // 2) *
                             (lax.axis_size(names[d]) if names[d] else 1)
                             for d in range(dim))
            g_dx0 = tuple(2 * h for h in last["dx"])
            g_a = None if last["acoef"] is None else _gather_full(
                _restrict(last["acoef"]), names)
            g_b = None if last["bcoefs"] is None else [
                _gather_face_coef(_coarsen_face_coef(last["bcoefs"][d], d),
                                  d, names) for d in range(dim)]
        else:
            g_shape0 = tuple(last["shape"][d] *
                             (lax.axis_size(names[d]) if names[d] else 1)
                             for d in range(dim))
            g_dx0 = last["dx"]
            g_a = None if last["acoef"] is None else _gather_full(
                last["acoef"], names)
            g_b = None if last["bcoefs"] is None else [
                _gather_face_coef(last["bcoefs"][d], d, names)
                for d in range(dim)]
        shape, ldx, la, lb = g_shape0, g_dx0, g_a, g_b
        lvl_bvl = [None] * dim
        lvl_bvh = [None] * dim
        # gathered levels are always correction equations (homogeneous BCs)

    # local (serial or gathered-redundant) levels
    first_local = len(levels)
    lmetric = metric
    while True:
        _bvl, _bvh = lvl_bvl, lvl_bvh

        def mk_fill(_bvl=_bvl, _bvh=_bvh):
            return lambda v: fill_bc(_grow(v), bl, bh, _bvl, _bvh)

        red, black = _checkerboards(shape)
        levels.append(dict(kind="local", shape=shape, dx=ldx, acoef=la,
                           bcoefs=lb, red=red, black=black, fill=mk_fill(),
                           metric=lmetric))
        if min(shape) <= min_size or any(n % 2 for n in shape):
            break
        shape = tuple(n // 2 for n in shape)
        ldx = tuple(2 * h for h in ldx)
        la = None if la is None else _restrict(la)
        lb = None if lb is None else [
            _coarsen_face_coef(lb[d], d) for d in range(dim)]
        lmetric = _coarsen_metric(lmetric, dim)
        lvl_bvl = [None] * dim
        lvl_bvh = [None] * dim

    def residual(u, rhs, lv):
        u_g = lv["fill"](u)
        return rhs - apply_op(u_g, lv["acoef"], lv["bcoefs"], alpha, beta,
                              lv["dx"], lv.get("metric"))

    def _coarse_direct(rhs_c, lv):
        """Exact coarsest solve: materialize the (tiny) dense operator by
        applying it to unit vectors (the MLMG bottom-solve analog). Runs
        redundantly on every device in sharded mode."""
        shape = lv["shape"]
        N = int(np.prod(shape))

        def col(i):
            ei = jnp.zeros((N,), rhs_c.dtype).at[i].set(1.0).reshape(shape)
            e_g = fill_bc(_grow(ei), bl, bh)  # homogeneous coarse BCs
            return apply_op(e_g, lv["acoef"], lv["bcoefs"], alpha, beta,
                            lv["dx"], lv.get("metric")).reshape(-1)

        A = jax.vmap(col)(jnp.arange(N)).T  # A[:, i] = L(e_i)
        if singular:
            # pin the mean to remove the nullspace
            A = A + jnp.ones((N, N), rhs_c.dtype) / N
        return jnp.linalg.solve(A, rhs_c.reshape(-1)).reshape(shape)

    def vcycle(k, u, rhs):
        lv = levels[k]
        if k == len(levels) - 1:
            N = int(np.prod(lv["shape"]))
            if lv["kind"] == "local" and N <= 1024:
                return _coarse_direct(rhs, lv)
            return _smooth(u, rhs, lv, alpha, beta, coarse_sweeps)
        u = _smooth(u, rhs, lv, alpha, beta, nu1)
        r = residual(u, rhs, lv)

        nxt = levels[k + 1]
        if lv["kind"] == "dist" and nxt["kind"] == "local":
            # transition: (optionally restrict locally then) gather
            if transition_restrict:
                r_c = _gather_full(_restrict(r), names)
            else:
                r_c = _gather_full(r, names)
            e_c = vcycle(k + 1, jnp.zeros_like(r_c), r_c)
            if transition_restrict:
                loc_c = tuple(n // 2 for n in lv["shape"])
                e_loc = _slice_local(e_c, loc_c, names)
                fill_c = lambda v: sharded_fill_bc(v, bl, bh, names)  # noqa: E731
                u = u + _prolong(e_loc, fill_c)
            else:
                u = u + _slice_local(e_c, lv["shape"], names)
        else:
            r_c = _restrict(r)
            e_c = vcycle(k + 1, jnp.zeros_like(r_c), r_c)
            u = u + _prolong(e_c, nxt["fill"])
        u = _smooth(u, rhs, lv, alpha, beta, nu2)
        return u

    if singular:
        rhs = rhs - gsum(rhs) / n_global

    u = jnp.zeros_like(rhs) if u0 is None else u0

    def de_mean(u):
        return u - gsum(u) / n_global if singular else u

    if rtol is None:
        for _ in range(n_vcycles):
            u = de_mean(vcycle(0, u, rhs))
        res = residual(u, rhs, levels[0])
        return u, gmax(jnp.abs(res))

    # run-to-tolerance (MLMG rel_eps semantics) in a while_loop
    rhs_norm = gmax(jnp.abs(rhs))
    tol = rtol * rhs_norm + atol

    def cond(carry):
        u, rnorm, it = carry
        return (rnorm > tol) & (it < n_vcycles)

    def body(carry):
        u, _, it = carry
        u = de_mean(vcycle(0, u, rhs))
        rnorm = gmax(jnp.abs(residual(u, rhs, levels[0])))
        return u, rnorm, it + 1

    rnorm0 = gmax(jnp.abs(residual(u, rhs, levels[0])))
    u, rnorm, _ = lax.while_loop(cond, body, (u, rnorm0, jnp.int32(0)))
    return u, rnorm


def poisson(rhs, dx, **kw):
    """Solve laplacian(u) = rhs (note ABec L = -div grad, so negate).

    This is the gravity-facing entry point: del^2 phi = 4 pi G rho
    (reference `Gravity::solve_phi_with_mlmg`, Gravity.cpp:3465)."""
    u, res = solve(-rhs, dx, alpha=0.0, beta=1.0, **kw)
    return u, res
