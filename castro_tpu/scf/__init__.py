"""Self-consistent-field initial models: Hachisu relaxation for (rotating)
equilibrium stars.

Reference: `Source/scf/scf_relax.cpp` (`scf_relaxation` :10,
`do_hscf_solve` :60-737): iterate {Poisson solve for phi; rotational
potential; Bernoulli constant + Omega^2 from two boundary points (equator
radius A, polar radius B); enthalpy field h = C - phi - psi; rho(h) via
EOS inversion; renormalize}, until the enthalpy field converges.

TPU design: whole-grid dense iteration, Poisson via the jitted multigrid,
rho(h) via the (vectorized) EOS inversion.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from castro_tpu.gravity import Gravity
from castro_tpu.utils import constants as C


def _sample_at(phi_like, geom, point):
    """Multilinear sample of a cell-centered interior field at a point."""
    dim = geom.dim
    idxs = []
    ws = []
    for d in range(dim):
        f = (point[d] - geom.prob_lo[d]) / geom.dx[d] - 0.5
        f = jnp.clip(f, 0.0, geom.n_cell[d] - 1.001)
        i0 = jnp.floor(f).astype(jnp.int32)
        idxs.append(i0)
        ws.append(f - i0)
    acc = 0.0
    for corner in range(2**dim):
        wt = 1.0
        idx = []
        for d in range(dim):
            bit = (corner >> d) & 1
            idx.append(idxs[d] + bit)
            wt = wt * jnp.where(bit == 1, ws[d], 1.0 - ws[d])
        acc = acc + wt * phi_like[tuple(idx)]
    return acc


def scf_relaxation(params, geom, layout, eos, rho_max_target,
                   r_A, r_B=None, n_iters=40, rho_floor=1e-10):
    """Relax to an equilibrium star.

    r_A: equatorial surface radius (along the first axis from the center);
    r_B: polar surface radius (along the last axis); r_B=None or r_B==r_A
    gives a nonrotating (Omega=0) model.

    Returns (rho, phi, omega) on the interior grid."""
    dim = geom.dim
    center = tuple(0.5 * (geom.prob_lo[d] + geom.prob_hi[d]) for d in range(dim))
    grav = Gravity(params, geom, layout, ng=0)

    # cylindrical radius about the rotation axis (last dim)
    R2 = 0.0
    for d in range(dim - 1) if dim > 1 else range(1):
        x = geom.cell_centers(d, 0) - center[d]
        R2 = R2 + x * x
    R2 = jnp.broadcast_to(R2, tuple(geom.n_cell))

    rotating = r_B is not None and abs(r_B - r_A) > 1e-12 * r_A
    ptA = list(center)
    ptA[0] = center[0] + r_A
    ptB = list(center)
    ptB[-1] = center[-1] + (r_B if r_B is not None else r_A)

    # initial guess: uniform sphere of radius r_A
    r = geom.radius(0, center=center)
    r = jnp.broadcast_to(r, tuple(geom.n_cell))
    rho = jnp.where(r < r_A, rho_max_target, rho_floor)

    def iteration(rho, _):
        g3, phi = grav.grav_vector(rho)
        phiA = _sample_at(phi, geom, ptA)
        phiB = _sample_at(phi, geom, ptB)
        R2A = (r_A) ** 2
        if rotating:
            # C = phiA - 0.5 w2 R2A = phiB  =>  w2 = 2 (phiA - phiB)/R2A
            w2 = jnp.maximum(2.0 * (phiA - phiB) / R2A, 0.0)
        else:
            w2 = jnp.asarray(0.0)
        Cb = phiB
        h = Cb - phi + 0.5 * w2 * R2
        h = jnp.maximum(h, 0.0)
        # rho(h) via EOS inversion (h is specific enthalpy)
        hmax = jnp.max(h)
        es = eos.rh(rho=jnp.maximum(rho, rho_floor), h=jnp.maximum(h, 1e-30))
        rho_new = jnp.where(h > 0.0, es.rho, rho_floor)
        # renormalize the central density to the target
        scale = rho_max_target / jnp.maximum(jnp.max(rho_new), rho_floor)
        rho_new = jnp.maximum(rho_new * scale, rho_floor)
        return rho_new, w2

    w2 = jnp.asarray(0.0)
    for _ in range(n_iters):
        rho, w2 = iteration(rho, None)
    g3, phi = grav.grav_vector(rho)
    return rho, phi, jnp.sqrt(w2)
