"""Passive tracer particles.

Reference: `Source/particles/CastroParticles.cpp` (AmrTracerParticleContainer:
init from file, advect with cell velocities, timestamp output, checkpoint
I/O). TPU design: positions as a dense [N, dim] array; velocity interpolation
is a vectorized multilinear gather from the grid, advection is RK2 (the
reference's AMReX tracer advance is the same midpoint scheme); out-of-domain
particles are parked at a sentinel instead of being removed (static shapes).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

SENTINEL = -1.0e30


class TracerParticles:
    def __init__(self, sim, positions: np.ndarray):
        """positions: [N, dim] initial particle positions."""
        self.sim = sim
        self.x = jnp.asarray(positions, dtype=sim.dtype)
        self._jit_advance = jax.jit(self._advance_impl)

    @classmethod
    def from_file(cls, sim, path):
        """reference particle_init_file format: count then one position
        per line (`CastroParticles.cpp:init_particles`)."""
        with open(path) as f:
            n = int(f.readline())
            pos = np.loadtxt(f, max_rows=n).reshape(n, -1)
        return cls(sim, pos[:, : sim.layout.dim])

    # -- interpolation ------------------------------------------------------
    def _velocity_at(self, u, x):
        """Multilinear interpolation of velocity at positions x [N, dim]."""
        sim = self.sim
        L = sim.layout
        g = sim.geom
        dim = L.dim
        rho = u[L.URHO]
        vels = [u[L.momentum_index(d)] / rho for d in range(dim)]

        # fractional index of each position (cell centers at (i+0.5)dx,
        # interior cell i maps to grown index i+ng)
        idx_f = []
        for d in range(dim):
            f = (x[:, d] - g.prob_lo[d]) / g.dx[d] - 0.5 + sim.ng
            idx_f.append(jnp.clip(f, 0.0, u.shape[1 + d] - 1.001))
        i0 = [jnp.floor(f).astype(jnp.int32) for f in idx_f]
        w = [f - i for f, i in zip(idx_f, i0)]

        out = []
        for v in vels:
            acc = 0.0
            for corner in range(2**dim):
                wt = 1.0
                idx = []
                for d in range(dim):
                    bit = (corner >> d) & 1
                    idx.append(i0[d] + bit)
                    wt = wt * jnp.where(bit == 1, w[d], 1.0 - w[d])
                acc = acc + wt * v[tuple(idx)]
            out.append(acc)
        return jnp.stack(out, axis=-1)

    # -- advection -----------------------------------------------------------
    def _advance_impl(self, x, u, dt):
        """Midpoint (RK2) advection with periodic wrap / sentinel parking."""
        sim = self.sim
        g = sim.geom
        dim = sim.layout.dim
        alive = x[:, 0] > 0.5 * SENTINEL

        v1 = self._velocity_at(u, x)
        x_half = x + 0.5 * dt * v1
        v2 = self._velocity_at(u, x_half)
        x_new = x + dt * v2

        for d in range(dim):
            lo, hi = g.prob_lo[d], g.prob_hi[d]
            if sim.cfg.lo_bc[d] == 0:  # periodic
                span = hi - lo
                x_new = x_new.at[:, d].set(lo + jnp.mod(x_new[:, d] - lo, span))
            else:
                out = (x_new[:, d] < lo) | (x_new[:, d] > hi)
                x_new = jnp.where(out[:, None], SENTINEL, x_new)
        return jnp.where(alive[:, None], x_new, x)

    def advance(self, dt):
        self.x = self._jit_advance(self.x, self.sim.u, dt)
        return self.x

    # -- I/O -------------------------------------------------------------------
    def checkpoint(self, path):
        np.savez_compressed(os.path.join(path, "particles.npz"),
                            x=np.asarray(self.x))

    def restart(self, path):
        self.x = jnp.asarray(np.load(os.path.join(path, "particles.npz"))["x"])

    def timestamp(self, fh, u=None):
        """Append t + positions (+rho, T at particles) to an open file
        (reference timestamp files)."""
        sim = self.sim
        xs = np.asarray(self.x)
        row = [sim.t]
        u = sim.u if u is None else u
        if sim.params.particles.timestamp_density:
            # sample density at particle sites
            rho = np.asarray(self._sample_field(u, sim.layout.URHO))
            for p, r in zip(xs, rho):
                fh.write(" ".join(map(str, [sim.t, *p, r])) + "\n")
        else:
            for p in xs:
                fh.write(" ".join(map(str, [sim.t, *p])) + "\n")

    def _sample_field(self, u, comp):
        sim = self.sim
        x = self.x

        def field_interp(x):
            L = sim.layout
            save = u[L.URHO]
            vel = u[comp]
            g = sim.geom
            dim = L.dim
            idx_f = []
            for d in range(dim):
                f = (x[:, d] - g.prob_lo[d]) / g.dx[d] - 0.5 + sim.ng
                idx_f.append(jnp.clip(f, 0.0, u.shape[1 + d] - 1.001))
            i0 = [jnp.floor(f).astype(jnp.int32) for f in idx_f]
            w = [f - i for f, i in zip(idx_f, i0)]
            acc = 0.0
            for corner in range(2**dim):
                wt = 1.0
                idx = []
                for d in range(dim):
                    bit = (corner >> d) & 1
                    idx.append(i0[d] + bit)
                    wt = wt * jnp.where(bit == 1, w[d], 1.0 - w[d])
                acc = acc + wt * vel[tuple(idx)]
            return acc

        return field_interp(x)
