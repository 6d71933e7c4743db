"""Self-gravity: ConstantGrav / MonopoleGrav / PoissonGrav.

Reference: the Gravity singleton (`Source/gravity/Gravity.cpp:110-141`
type dispatch; `solve_for_phi` :418; `get_old/new_grav_vector` :838,911;
multipole boundary fill :1579-1743; monopole/radial gravity
`make_radial_gravity`).

TPU design: the Poisson solve is the jitted fixed-cycle multigrid
(`castro_tpu/solvers/multigrid.py`); the monopole path is a radial
segment-sum (scatter-add) + gather, fully on-device.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from castro_tpu.geometry import CoordSys, Geometry
from castro_tpu.solvers import multigrid as mg
from castro_tpu.utils import constants as C


class Gravity:
    """One object covering the (single) level, like the reference singleton."""

    def __init__(self, params, geom: Geometry, layout, ng: int):
        self.params = params
        self.geom = geom
        self.layout = layout
        self.ng = ng
        self.gtype = params.gravity.gravity_type
        self.const_grav = params.gravity.const_grav
        g = params.geometry
        self.periodic = all(
            b == 0 for b in params.castro.lo_bc[: geom.dim]
        ) and all(b == 0 for b in params.castro.hi_bc[: geom.dim])
        self.n_vcycles = 10
        # gravity acts toward -"vertical": reference ConstantGrav applies
        # const_grav along the last spatial dimension
        self.vert = geom.dim - 1

    # -- public API ---------------------------------------------------------
    def grav_vector(self, rho_interior):
        """g components [3, interior grid] (+ phi or None)."""
        if self.gtype == "ConstantGrav":
            g, phi = self._constant(rho_interior)
        elif self.gtype == "MonopoleGrav":
            g, phi = self._monopole(rho_interior)
        elif self.gtype == "PoissonGrav":
            g, phi = self._poisson(rho_interior)
        else:
            raise ValueError(self.gtype)
        pm = self.params.castro.point_mass
        if self.params.castro.use_point_mass and pm != 0.0:
            g = g + self._point_mass_field(rho_interior, pm)
        return g, phi

    def _point_mass_field(self, rho, mass):
        """Central point mass (reference Castro_pointmass.cpp): g adds
        -G M rhat / r^2 about the problem center."""
        geom = self.geom
        r, center = self._radius_and_center()
        r = jnp.broadcast_to(r, rho.shape)
        rsafe = jnp.maximum(r, 0.5 * min(geom.dx))
        gmag = -C.Gconst * mass / (rsafe * rsafe)
        g = [jnp.zeros_like(rho) for _ in range(3)]
        if geom.coord == CoordSys.SPHERICAL or geom.dim == 1:
            g[0] = gmag
        else:
            for d in range(geom.dim):
                x = geom.cell_centers(d, 0) - center[d]
                g[d] = gmag * jnp.broadcast_to(x, rho.shape) / rsafe
        return jnp.stack(g)

    # -- ConstantGrav ---------------------------------------------------------
    def _constant(self, rho):
        shape = rho.shape
        g = [jnp.zeros(shape, rho.dtype) for _ in range(3)]
        g[self.vert] = jnp.full(shape, self.const_grav, rho.dtype)
        return jnp.stack(g), None

    # -- MonopoleGrav -----------------------------------------------------------
    def _radius_and_center(self):
        geom = self.geom
        # center: origin for symmetric/axisymmetric problems (r starts at 0),
        # else the domain center; 1D spherical: r coordinate itself
        if geom.coord == CoordSys.SPHERICAL:
            r = geom.cell_centers(0, 0)
            return jnp.broadcast_to(r, tuple(geom.n_cell)), None
        center = []
        for d in range(geom.dim):
            lo_sym = self.params.castro.lo_bc[d] in (3, 4, 5)
            center.append(geom.prob_lo[d] if lo_sym else
                          0.5 * (geom.prob_lo[d] + geom.prob_hi[d]))
        r2 = 0.0
        for d in range(geom.dim):
            x = geom.cell_centers(d, 0) - center[d]
            r2 = r2 + x * x
        return jnp.sqrt(r2), center

    def _monopole(self, rho):
        """Radial mass binning -> enclosed mass -> g = -G M(<r)/r^2
        (reference `make_radial_gravity` + `interpolate_monopole_grav`)."""
        geom = self.geom
        r, center = self._radius_and_center()
        r = jnp.broadcast_to(r, rho.shape)
        dr = min(geom.dx) / max(self.params.gravity.drdxfac, 1)
        # max radius across the domain corners
        rmax = 0.0
        for d in range(geom.dim):
            span = geom.prob_hi[d] - geom.prob_lo[d]
            rmax += span * span
        rmax = math.sqrt(rmax)
        nbins = int(np.ceil(rmax / dr)) + 2

        vol = jnp.broadcast_to(geom.volume(0), rho.shape)
        ibin = jnp.clip((r / dr).astype(jnp.int32), 0, nbins - 1)
        mass_in_bin = jax.ops.segment_sum(
            (rho * vol).ravel(), ibin.ravel(), num_segments=nbins)
        # geometry factor: in 2D-Cartesian/1D-Cartesian the "enclosed mass"
        # monopole is only meaningful for spherical-like setups; reference
        # restricts MonopoleGrav similarly.
        m_enc = jnp.cumsum(mass_in_bin)  # mass inside edge (i+1)*dr
        # interpolate enclosed mass to each cell's actual radius
        m_lo = jnp.concatenate([jnp.zeros(1, m_enc.dtype), m_enc[:-1]])
        w = jnp.clip(r / dr - ibin, 0.0, 1.0)
        m_r = (1.0 - w) * jnp.take(m_lo, ibin) + w * jnp.take(m_enc, ibin)
        rsafe2 = jnp.maximum(r, 0.5 * dr) ** 2
        gr = -C.Gconst * m_r / rsafe2
        # direction: radial unit vector
        g = [jnp.zeros_like(rho) for _ in range(3)]
        if geom.coord == CoordSys.SPHERICAL or geom.dim == 1:
            g[0] = gr
        else:
            rsafe = jnp.maximum(r, 1e-30)
            for d in range(geom.dim):
                x = geom.cell_centers(d, 0) - center[d]
                g[d] = gr * jnp.broadcast_to(x, rho.shape) / rsafe
        return jnp.stack(g), None

    # -- PoissonGrav ------------------------------------------------------------
    def _poisson(self, rho):
        geom = self.geom
        rhs = 4.0 * math.pi * C.Gconst * rho
        if geom.coord != CoordSys.CARTESIAN:
            return self._poisson_curvilinear(rho)
        if self.periodic:
            bc_lo = bc_hi = ("periodic",) * geom.dim
            bvl = bvh = None
        else:
            # isolated BCs: multipole (monopole term) Dirichlet values on the
            # domain faces (reference fill_multipole_BCs, Gravity.cpp:1743;
            # lnum=0 monopole; higher moments TODO)
            bc_lo = bc_hi = ("dirichlet",) * geom.dim
            vol = jnp.broadcast_to(geom.volume(0), rho.shape)
            mtot = jnp.sum(rho * vol)
            r, center = self._radius_and_center()
            if center is None:
                center = [0.0] * geom.dim
            bvl, bvh = [], []
            for d in range(geom.dim):
                bvl.append(self._face_phi(mtot, center, d, "lo"))
                bvh.append(self._face_phi(mtot, center, d, "hi"))
        phi, res = mg.poisson(rhs, geom.dx, bc_lo=bc_lo, bc_hi=bc_hi,
                              bc_vals_lo=bvl, bc_vals_hi=bvh,
                              n_vcycles=self.n_vcycles)
        g = self._grad_phi(phi, bvl, bvh)
        return g, phi

    def _face_phi(self, mtot, center, d, side):
        """Monopole potential -G M / r on one domain face (cell-center
        positions of the face plane)."""
        geom = self.geom
        dim = geom.dim
        coords = []
        shape = [1] * dim
        for k in range(dim):
            if k == d:
                x = jnp.asarray(geom.prob_lo[k] if side == "lo" else geom.prob_hi[k],
                                dtype=geom.dtype)
                coords.append(x - center[k])
            else:
                c = geom.cell_centers_1d(k, 0) - center[k]
                sh = [1] * dim
                sh[k] = c.shape[0]
                coords.append(c.reshape(sh))
        r2 = 0.0
        for x in coords:
            r2 = r2 + x * x
        r = jnp.sqrt(r2)
        face = -C.Gconst * mtot / jnp.maximum(r, 1e-30)
        # shape: broadcast over the face plane; axis d is size 1
        target = [geom.n_cell[k] if k != d else 1 for k in range(dim)]
        return jnp.broadcast_to(face, tuple(target))

    def _grad_phi(self, phi, bvl, bvh):
        """g = -grad(phi), centered differences; one-sided with the BC face
        value at domain boundaries (reference get_new_grav_vector)."""
        geom = self.geom
        dim = geom.dim
        if self.periodic:
            pad_codes = (mg.PERIODIC,) * dim
            phi_g = mg.fill_bc(mg._grow(phi), pad_codes, pad_codes)
        else:
            pad_codes = (mg.DIRICHLET,) * dim
            phi_g = mg.fill_bc(mg._grow(phi), pad_codes, pad_codes, bvl, bvh)
        g = [jnp.zeros_like(phi) for _ in range(3)]
        for d in range(dim):
            v = phi_g
            for k in range(dim):
                if k != d:
                    v = v[mg._take(v, k, 1, v.shape[k] - 1)]
            n = v.shape[d] - 2
            hi = v[mg._take(v, d, 2, n + 2)]
            lo = v[mg._take(v, d, 0, n)]
            g[d] = -(hi - lo) / (2.0 * geom.dx[d])
        return jnp.stack(g)

    def _poisson_curvilinear(self, rho):
        """1D spherical / 2D RZ Poisson via the metric-weighted operator.

        For 1D spherical this reduces to the monopole solution, which is
        exact — use it (reference does the same above max_solve_level)."""
        return self._monopole(rho)
