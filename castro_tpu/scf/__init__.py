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
                   r_A, r_B=None, n_iters=None, rho_floor=1e-10,
                   T=None, xn=None, tol=None, verbose=False):
    """Full Hachisu SCF relaxation (reference `do_hscf_solve`,
    scf_relax.cpp:60-737):

      iterate { Poisson phi from rho;
                sample (phi, psi) at the two fixing points
                  A = center + scf_equatorial_radius * xhat
                  B = center + scf_polar_radius * zhat;
                Omega^2 = -(phi_A - phi_B)/(psi_A - psi_B) with
                  psi = -R_cyl^2/2, Omega clamped to +-10%/iteration;
                Bernoulli constant C = phi_A + Omega^2 psi_A;
                enthalpy h = C - phi - Omega^2 psi, rescaled so its max
                  equals the target h(scf_maximum_density, T, X);
                rho = EOS^-1(h) where h > 0;
                converge on Linf |drho|/rho over rho > 1e-3 rho_max }

    r_A: equatorial surface radius; r_B: polar surface radius (None or
    == r_A: nonrotating). Returns (rho, phi, omega)."""
    dim = geom.dim
    c = params.castro
    tol = tol if tol is not None else getattr(c, "scf_relax_tol", 1e-3)
    max_iter = (n_iters if n_iters is not None
                else getattr(c, "scf_max_iterations", 30))
    center = tuple(0.5 * (geom.prob_lo[d] + geom.prob_hi[d]) for d in range(dim))
    grav = Gravity(params, geom, layout, ng=0)

    # rotational psi = -R_cyl^2/2 about the rotation (last) axis
    # (reference fill_rotational_psi)
    R2 = 0.0
    for d in range(dim - 1) if dim > 1 else range(1):
        x = geom.cell_centers(d, 0) - center[d]
        R2 = R2 + x * x
    R2 = jnp.broadcast_to(R2, tuple(geom.n_cell))
    psi = -0.5 * R2

    rotating = r_B is not None and abs(r_B - r_A) > 1e-6 * abs(r_A)
    ptA = list(center)
    ptA[0] = center[0] + r_A
    ptB = list(center)
    ptB[-1] = center[-1] + (r_B if r_B is not None else r_A)

    # target maximum enthalpy from the requested maximum density and the
    # (uniform) temperature/composition (scf_relax.cpp:97-146)
    T_arr = jnp.asarray(1e4 if T is None else T)
    target_h_max = eos.rt(rho=jnp.asarray(rho_max_target), T=T_arr,
                          xn=xn).h

    # initial guess: uniform sphere of radius r_A
    r = geom.radius(0, center=center)
    r = jnp.broadcast_to(r, tuple(geom.n_cell))
    rho = jnp.where(r < r_A, rho_max_target, rho_floor)

    @jax.jit
    def iteration(rho, w_prev):
        g3, phi = grav.grav_vector(rho)
        phiA = _sample_at(phi, geom, ptA)
        phiB = _sample_at(phi, geom, ptB)
        psiA = _sample_at(psi, geom, ptA)
        psiB = _sample_at(psi, geom, ptB)
        if rotating:
            # Hachisu eq. 16 (scf_relax.cpp:338)
            w2 = jnp.maximum(-(phiA - phiB) / (psiA - psiB), 0.0)
            w = jnp.sqrt(w2)
            # limit the period change per iteration (:351-354). The
            # reference clamps to 10% against a USER-SUPPLIED initial
            # period; starting from the raw first estimate instead, a
            # tight clamp locks in a slow geometric drift that
            # oscillates, so the band is wider here (convergence is
            # measured on the density field either way).
            w = jnp.where(w_prev > 0.0,
                          jnp.clip(w, 0.5 * w_prev, 2.0 * w_prev), w)
            w2 = w * w
        else:
            w2 = jnp.asarray(0.0)
            w = jnp.asarray(0.0)
        # Bernoulli constant at point A (:377-450)
        bern = phiA + w2 * psiA
        h = bern - phi - w2 * psi
        # rescale so max h equals the target (:535)
        h_max = jnp.maximum(jnp.max(h), 1e-300)
        h_scaled = target_h_max * h / h_max
        es = eos.rh(rho=jnp.maximum(rho, rho_floor),
                    h=jnp.maximum(h_scaled, 1e-30), xn=xn)
        rho_new = jnp.where((h > 0.0) & (rho > 0.0),
                            jnp.maximum(es.rho, rho_floor), rho_floor)
        # convergence: Linf over dense zones (:570-576)
        rho_max = jnp.max(rho_new)
        drho = jnp.abs(rho_new - rho) / jnp.maximum(rho, rho_floor)
        linf = jnp.max(jnp.where(rho_new > 1e-3 * rho_max, drho, 0.0))
        return rho_new, w, linf

    w = jnp.asarray(0.0)
    for it in range(max_iter):
        rho, w, linf = iteration(rho, w)
        if verbose:
            print(f"  SCF iter {it + 1}: Linf(drho)={float(linf):.3e} "
                  f"omega={float(w):.4e}")
        if float(linf) < tol:
            break
    g3, phi = grav.grav_vector(rho)
    return rho, phi, w
