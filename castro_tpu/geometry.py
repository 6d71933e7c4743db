"""Grid geometry: Cartesian / cylindrical(RZ) / spherical metric factors.

Mirrors the role of AMReX `Geometry` + `Castro::buildMetrics`
(reference `Source/driver/Castro.cpp:740`): cell sizes, face areas and cell
volumes used by the conservative update (`consup_hydro`,
`Source/hydro/Castro_ctu.cpp:12`), including the 2*pi (RZ) and 4*pi (spherical)
solid-angle factors AMReX bakes into volumes/areas.

All metric arrays are returned as 1D radial profiles broadcast-shaped to the
grid so XLA keeps them tiny and fuses the multiplies.
"""

from __future__ import annotations

import enum
import math
from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp
import numpy as np


class CoordSys(enum.IntEnum):
    CARTESIAN = 0
    CYLINDRICAL = 1  # 2D r-z or 1D r
    SPHERICAL = 2  # 1D r


@dataclass(frozen=True)
class Geometry:
    """Uniform-grid geometry for one level.

    A *local view* (see `local_view`) describes one shard of a domain-
    decomposed run: `n_cell` is the local cell count, `n_global` the whole
    domain's, and `ilo[d]` the global index of local cell 0 along d (may be
    a traced value inside `shard_map`). Coordinates and metric arrays are
    then correct for the shard's position; `dx` stays global.
    """

    dim: int
    coord: CoordSys
    prob_lo: Tuple[float, ...]
    prob_hi: Tuple[float, ...]
    n_cell: Tuple[int, ...]
    dtype: object = jnp.float32
    n_global: Tuple[int, ...] = None
    ilo: Tuple = None

    @property
    def dx(self) -> Tuple[float, ...]:
        n = self.n_global if self.n_global is not None else self.n_cell
        return tuple(
            (self.prob_hi[d] - self.prob_lo[d]) / n[d] for d in range(self.dim)
        )

    def local_view(self, n_local: Tuple[int, ...], ilo: Tuple) -> "Geometry":
        """Shard-local geometry: n_local cells starting at global index ilo."""
        base = self.n_global if self.n_global is not None else self.n_cell
        return Geometry(self.dim, self.coord, self.prob_lo, self.prob_hi,
                        tuple(n_local), self.dtype, n_global=base,
                        ilo=tuple(ilo))

    def refined(self, ratio: int) -> "Geometry":
        return Geometry(
            self.dim,
            self.coord,
            self.prob_lo,
            self.prob_hi,
            tuple(n * ratio for n in self.n_cell),
            self.dtype,
        )

    # -- coordinates ------------------------------------------------------
    def cell_centers_1d(self, d: int, ng: int = 0) -> jnp.ndarray:
        """1D array of cell-center coordinates along axis d, with ng ghosts."""
        dx = self.dx[d]
        i = np.arange(-ng, self.n_cell[d] + ng)
        if self.ilo is not None:
            i = jnp.asarray(i, dtype=self.dtype) + self.ilo[d]
        return jnp.asarray(self.prob_lo[d] + (i + 0.5) * dx, dtype=self.dtype)

    def faces_1d(self, d: int, ng: int = 0) -> jnp.ndarray:
        """1D array of face coordinates along axis d (n+1 faces), with ng ghosts."""
        dx = self.dx[d]
        i = np.arange(-ng, self.n_cell[d] + ng + 1)
        if self.ilo is not None:
            i = jnp.asarray(i, dtype=self.dtype) + self.ilo[d]
        return jnp.asarray(self.prob_lo[d] + i * dx, dtype=self.dtype)

    def bshape(self, arr: jnp.ndarray, axis: int) -> jnp.ndarray:
        """Reshape a 1D coordinate array to broadcast along spatial `axis`
        of a [..., nx, ny, nz] grid array (spatial axes are the LAST dim axes)."""
        shape = [1] * self.dim
        shape[axis] = arr.shape[0]
        return arr.reshape(shape)

    def cell_centers(self, d: int, ng: int = 0) -> jnp.ndarray:
        return self.bshape(self.cell_centers_1d(d, ng), d)

    def radius(self, ng: int = 0, center: Tuple[float, ...] = None) -> jnp.ndarray:
        """Distance from `center` (default domain center) at cell centers."""
        if center is None:
            center = tuple(
                0.5 * (self.prob_lo[d] + self.prob_hi[d]) for d in range(self.dim)
            )
        r2 = 0.0
        for d in range(self.dim):
            x = self.cell_centers(d, ng) - center[d]
            r2 = r2 + x * x
        return jnp.sqrt(r2)

    # -- metric factors ----------------------------------------------------
    def volume(self, ng: int = 0) -> jnp.ndarray:
        """Cell volumes, broadcastable to the grid (AMReX CoordSys::Volume)."""
        dx = self.dx
        if self.coord == CoordSys.CARTESIAN:
            v = float(np.prod(dx))
            return jnp.full((1,) * self.dim, v, dtype=self.dtype)
        if self.coord == CoordSys.CYLINDRICAL:
            # r is axis 0; vol = pi*(r_hi^2 - r_lo^2)*dz (1D: *1)
            rf = self.faces_1d(0, ng)
            dv = math.pi * (rf[1:] ** 2 - rf[:-1] ** 2)
            if self.dim >= 2:
                dv = dv * dx[1]
            if self.dim == 3:
                raise ValueError("3D cylindrical not supported (matches reference)")
            return self.bshape(dv.astype(self.dtype), 0)
        if self.coord == CoordSys.SPHERICAL:
            if self.dim != 1:
                raise ValueError("spherical coords are 1D only (matches reference)")
            rf = self.faces_1d(0, ng)
            dv = (4.0 * math.pi / 3.0) * (rf[1:] ** 3 - rf[:-1] ** 3)
            return self.bshape(dv.astype(self.dtype), 0)
        raise ValueError(self.coord)

    def face_area(self, d: int, ng: int = 0) -> jnp.ndarray:
        """Face areas for faces normal to axis d, FACE-REGISTERED: index i
        holds the area of face i-1/2, same array length as the cell grid
        (the area of the last cell's hi face is obtained by shifting)."""
        dx = self.dx
        if self.coord == CoordSys.CARTESIAN:
            a = float(np.prod([dx[k] for k in range(self.dim) if k != d])) if self.dim > 1 else 1.0
            shape = [1] * self.dim
            return jnp.full(shape, a, dtype=self.dtype)
        if self.coord == CoordSys.CYLINDRICAL:
            if d == 0:
                rf = self.faces_1d(0, ng)[:-1]
                a = 2.0 * math.pi * rf
                if self.dim >= 2:
                    a = a * dx[1]
                return self.bshape(a.astype(self.dtype), 0)
            else:
                rf = self.faces_1d(0, ng)
                a = math.pi * (rf[1:] ** 2 - rf[:-1] ** 2)
                return self.bshape(a.astype(self.dtype), 0)
        if self.coord == CoordSys.SPHERICAL:
            rf = self.faces_1d(0, ng)[:-1]
            a = 4.0 * math.pi * rf**2
            return self.bshape(a.astype(self.dtype), 0)
        raise ValueError(self.coord)

    def shift_factor(self, d: int) -> float:
        """dt/dx factor helper."""
        return 1.0 / self.dx[d]


def geometry_from_params(params, dtype=None) -> Geometry:
    g = params.geometry
    dim = params.dim
    if dtype is None:
        dtype = jnp.float64 if params.tpu.dtype == "float64" else jnp.float32
    return Geometry(
        dim=dim,
        coord=CoordSys(g.coord_sys),
        prob_lo=tuple(g.prob_lo[:dim]),
        prob_hi=tuple(g.prob_hi[:dim]),
        n_cell=tuple(params.amr.n_cell[:dim]),
        dtype=dtype,
    )
