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

    # -- AMR: level ownership + redistribution ------------------------------
    def redistribute(self, asim):
        """Assign each particle to the finest level whose refined (masked)
        region covers it (reference AmrTracerParticleContainer::
        Redistribute() after regrid, CastroParticles.cpp). Returns the
        per-particle level array (also stored as self.level)."""
        x = np.asarray(self.x)
        n = x.shape[0]
        dim = asim.dim
        level = np.zeros(n, np.int32)
        for l in range(1, asim.max_level + 1):
            dxl = asim.geom_full[l].dx
            wins = [asim.window[l]] + [(e["ilo"], e["shape"])
                                       for e in asim.extra[l]]
            masks = [asim.masks[l]] + [e["mask"] for e in asim.extra[l]]
            for (ilo, shape), mask in zip(wins, masks):
                m = np.asarray(mask)
                idx = []
                inside = np.ones(n, bool)
                for d in range(dim):
                    f = ((x[:, d] - asim.geom_full[l].prob_lo[d])
                         / dxl[d]).astype(int) - int(ilo[d])
                    inside &= (f >= 0) & (f < shape[d])
                    idx.append(np.clip(f, 0, shape[d] - 1))
                covered = inside & m[tuple(idx)]
                level = np.where(covered, l, level)
        self.level = level
        return level

    def advance_amr(self, asim, dt):
        """Advect with the finest-available velocity field: particles
        inside refined regions use the fine-window data (the reference
        advances particles per level on their owning grids)."""
        if not hasattr(self, "level"):
            self.redistribute(asim)
        x = self.x
        # level-0 advance for everyone, then overwrite refined particles
        x0 = self._jit_advance(x, asim.u[0], dt)
        if asim.max_level == 0:
            self.x = x0
            return self.x
        lev1 = jnp.asarray(self.level >= 1)
        wins = [asim.window[1]] + [(e["ilo"], e["shape"])
                                   for e in asim.extra[1]]
        us = [asim.u[1]] + [e["u"] for e in asim.extra[1]]
        xf = x0
        for (ilo, shape), u_w in zip(wins, us):
            xw = self._advance_window(x, u_w, ilo, shape,
                                      asim.geom_full[1], dt)
            inside = jnp.ones(x.shape[0], bool)
            for d in range(asim.dim):
                lo = (asim.geom_full[1].prob_lo[d]
                      + int(ilo[d]) * asim.geom_full[1].dx[d])
                hi = lo + shape[d] * asim.geom_full[1].dx[d]
                inside = inside & (x[:, d] >= lo) & (x[:, d] < hi)
            xf = jnp.where((lev1 & inside)[:, None], xw, xf)
        self.x = xf
        return self.x

    def _advance_window(self, x, u_w, ilo, shape, geom_l, dt):
        """RK2 advance against one fine window's grown state."""
        sim = self.sim
        dim = sim.layout.dim
        origin = [geom_l.prob_lo[d] + int(ilo[d]) * geom_l.dx[d]
                  for d in range(dim)]

        def vel_at(pts):
            L = sim.layout
            rho = u_w[L.URHO]
            vels = [u_w[L.momentum_index(d)] / rho for d in range(dim)]
            idx_f = []
            for d in range(dim):
                f = (pts[:, d] - origin[d]) / geom_l.dx[d] - 0.5 + sim.ng
                idx_f.append(jnp.clip(f, 0.0, u_w.shape[1 + d] - 1.001))
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

        v1 = vel_at(x)
        xh = x + 0.5 * dt * v1
        v2 = vel_at(xh)
        return x + dt * v2

    # -- distributed advection ----------------------------------------------
    def make_sharded_advance(self, mesh):
        """Tracer advection under a device mesh (reference: particles live
        on the MPI rank owning their grid and are redistributed on
        crossing, `AmrTracerParticleContainer` via CastroParticles.cpp).

        TPU-native design: positions stay REPLICATED ([N, dim] is tiny
        next to the field data), the state is spatially sharded; each
        shard evaluates the RK2 velocities only for particles whose
        containing zone lies in its subdomain and the one-owner psum
        combines them. The halo-filled local block covers the +-1-cell
        interpolation stencil at shard edges and the physical-BC ghost
        fill at domain edges, so the result matches the single-device
        `advance` exactly (decomposition invariance,
        tests/test_particles_sharded.py).

        Returns a jitted step(x, u_global_interior, dt) -> x_new with u
        stored WITHOUT ghosts (same convention as make_sharded_step).
        """
        from jax import lax, shard_map
        from jax.sharding import PartitionSpec as P

        from castro_tpu.parallel.decomp import (make_step_ctx,
                                                spatial_axis_names)

        sim = self.sim
        L = sim.layout
        g = sim.geom
        ng = sim.ng
        dim = L.dim
        names = spatial_axis_names(sim, mesh)
        spec_u = P(None, *names)

        def local_adv(x, u_loc, dt):
            n_loc = u_loc.shape[1:]
            ctx = make_step_ctx(sim, names, n_loc=n_loc)
            u = jnp.pad(u_loc, [(0, 0)] + [(ng, ng)] * dim)
            u = ctx.fill(u, 0.0)
            ilo = [lax.axis_index(names[d]) * n_loc[d]
                   if names[d] is not None else 0 for d in range(dim)]
            ndom = [n_loc[d] * (mesh.shape[names[d]]
                                if names[d] is not None else 1)
                    for d in range(dim)]
            rho = u[L.URHO]
            vels = [u[L.momentum_index(d)] / rho for d in range(dim)]

            def vel(pts):
                own = pts[:, 0] > 0.5 * SENTINEL
                i0s, ws = [], []
                for d in range(dim):
                    s = (pts[:, d] - g.prob_lo[d]) / g.dx[d]
                    zone = jnp.clip(jnp.floor(s).astype(jnp.int32),
                                    0, ndom[d] - 1)
                    own = own & (zone >= ilo[d]) & (zone < ilo[d] + n_loc[d])
                    # local fractional grown index; the clip reproduces
                    # the single-device ghost-zone clamp on edge shards
                    fl = jnp.clip(s - 0.5 - ilo[d] + ng,
                                  0.0, u.shape[1 + d] - 1.001)
                    i0s.append(jnp.floor(fl).astype(jnp.int32))
                    ws.append(fl - jnp.floor(fl))
                out = []
                for v in vels:
                    acc = 0.0
                    for corner in range(2 ** dim):
                        wt = 1.0
                        idx = []
                        for d in range(dim):
                            bit = (corner >> d) & 1
                            idx.append(i0s[d] + bit)
                            wt = wt * jnp.where(bit == 1, ws[d],
                                                1.0 - ws[d])
                        acc = acc + wt * v[tuple(idx)]
                    out.append(acc)
                vv = jnp.stack(out, axis=-1)
                return ctx.psum(jnp.where(own[:, None], vv, 0.0))

            alive = x[:, 0] > 0.5 * SENTINEL
            v1 = vel(x)
            x_half = x + 0.5 * dt * v1
            v2 = vel(x_half)
            x_new = x + dt * v2
            for d in range(dim):
                lo, hi = g.prob_lo[d], g.prob_hi[d]
                if sim.cfg.lo_bc[d] == 0:  # periodic
                    span = hi - lo
                    x_new = x_new.at[:, d].set(
                        lo + jnp.mod(x_new[:, d] - lo, span))
                else:
                    out_d = (x_new[:, d] < lo) | (x_new[:, d] > hi)
                    x_new = jnp.where(out_d[:, None], SENTINEL, x_new)
            return jnp.where(alive[:, None], x_new, x)

        mapped = shard_map(local_adv, mesh=mesh,
                           in_specs=(P(), spec_u, P()),
                           out_specs=P(), check_vma=False)
        return jax.jit(mapped)

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
