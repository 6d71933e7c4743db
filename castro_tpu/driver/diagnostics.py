"""Integral diagnostics (reference `sum_integrated_quantities.cpp` +
`sum_utils.cpp`): volume-weighted global sums — mass, momentum, angular
momentum, kinetic/internal/total energy, species masses, center of mass —
printed and appended to data_log files every sum_interval steps."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def sum_integrated_quantities(sim, u_interior=None) -> Dict[str, float]:
    L = sim.layout
    g = sim.geom
    u = sim.interior() if u_interior is None else u_interior
    vol = jnp.broadcast_to(g.volume(0), u.shape[1:])

    def vsum(f):
        return float(jnp.sum(f * vol))

    rho = u[L.URHO]
    out = {
        "time": sim.t,
        "mass": vsum(rho),
        "xmom": vsum(u[L.UMX]),
        "ymom": vsum(u[L.UMY]),
        "zmom": vsum(u[L.UMZ]),
        "kinetic_energy": vsum(0.5 * (u[L.UMX] ** 2 + u[L.UMY] ** 2 + u[L.UMZ] ** 2) / rho),
        "internal_energy": vsum(u[L.UEINT]),
        "total_energy": vsum(u[L.UEDEN]),
    }
    # center of mass + angular momentum
    c = [0.5 * (g.prob_lo[d] + g.prob_hi[d]) for d in range(g.dim)]
    x = []
    for k in range(3):
        if k < g.dim:
            x.append(jnp.broadcast_to(g.cell_centers(k, 0) - c[k], rho.shape))
        else:
            x.append(jnp.zeros_like(rho))
    mom = [u[L.UMX], u[L.UMY], u[L.UMZ]]
    for d, (j, k) in enumerate([(1, 2), (2, 0), (0, 1)]):
        out[f"ang_mom_{'xyz'[d]}"] = vsum(x[j] * mom[k] - x[k] * mom[j])
    m = max(out["mass"], 1e-300)
    for d in range(g.dim):
        out[f"com_{'xyz'[d]}"] = vsum(rho * x[d]) / m
    for i, name in enumerate(sim.network.spec_names):
        out[f"mass_{name}"] = vsum(u[L.UFS + i])
    if getattr(sim, "problem_diagnostics", None) is not None:
        # reference problem_diagnostics.H hook (e.g. wdmerger's custom
        # sum_integrated_quantities overrides)
        out.update(sim.problem_diagnostics(sim, u, out))
    if sim.params.castro.gw_dist > 0.0:
        out.update(gwstrain(sim, u_interior=u))
    return out


class DataLogger:
    """data_logs analog: appends whitespace-separated columns with a header
    (reference sum_integrated_quantities.cpp:173-463 log writes)."""

    def __init__(self, path):
        self.path = path
        self._wrote_header = False

    def log(self, row: Dict[str, float]):
        mode = "a" if self._wrote_header else "w"
        with open(self.path, mode) as f:
            if not self._wrote_header:
                f.write("# " + " ".join(row.keys()) + "\n")
                self._wrote_header = True
            f.write(" ".join(f"{v:.14e}" if isinstance(v, float) else str(v)
                             for v in row.values()) + "\n")


def gwstrain(sim, u_interior=None, time=None) -> Dict[str, float]:
    """Gravitational-wave strain h_+/h_x seen by an observer at
    castro.gw_dist kpc along each coordinate axis (reference
    Castro::gwstrain, sum_utils.cpp:343-661).

    Computes the second time derivative of the quadrupole moment
    directly from the instantaneous state (Loren-Aguilar et al. 2005
    eq. 5): Qtt_lm = STF( 2 * integral rho (v_l v_m + x_l g_m) dV ), then the
    transverse-traceless projection h^TT = P Qtt with the 2G/(c^4 r)
    coefficient (Blanchet, Damour & Schafer 1990 eqs. 6.5-6.7)."""
    from castro_tpu.utils import constants as C

    c = sim.params.castro
    if c.gw_dist <= 0.0:
        return {}
    L = sim.layout
    g = sim.geom
    u = sim.interior() if u_interior is None else u_interior
    t = sim.t if time is None else time
    rho = u[L.URHO]
    vol = jnp.broadcast_to(g.volume(0), rho.shape)
    rhoinv = jnp.where(rho > 0.0, 1.0 / jnp.maximum(rho, 1e-300), 0.0)

    center = [0.5 * (g.prob_lo[d] + g.prob_hi[d]) for d in range(g.dim)]
    pos = []
    for k in range(3):
        if k < g.dim:
            pos.append(jnp.broadcast_to(g.cell_centers(k, 0) - center[k],
                                        rho.shape))
        else:
            pos.append(jnp.zeros_like(rho))
    vel = [u[L.UMX] * rhoinv, u[L.UMY] * rhoinv, u[L.UMZ] * rhoinv]

    # gravitational acceleration from the active Gravity source
    grav_src = next((s for s in sim.source_fns
                     if hasattr(s, "grav_field")), None)
    rot_src = next((s for s in sim.source_fns
                    if s.__class__.__name__ == "RotationSource"), None)
    if grav_src is not None:
        g3, _ = grav_src.grav_field(sim, sim.u, None)  # grown [3, grid]
        from castro_tpu.ops.stencil import interior_slice

        inner = interior_slice(sim.ng, L.dim, comp_ndim=0)
        gvec = [g3[k][inner] for k in range(3)]
    else:
        gvec = [jnp.zeros_like(rho) for _ in range(3)]

    # rotation: map to the inertial frame (sum_utils.cpp:462-497);
    # rotation about the z axis (the 3D default)
    if rot_src is not None and g.dim == 3 and rot_src.omega_mag > 0.0:
        wz = float(rot_src._omega()[2])
        ct, st = np.cos(wz * t), np.sin(wz * t)

        def rot(a):
            return [ct * a[0] - st * a[1], st * a[0] + ct * a[1], a[2]]

        pos_i = rot(pos)
        vel_i = rot([vel[0] - wz * pos[1], vel[1] + wz * pos[0], vel[2]])
        g_i = rot(gvec)
    else:
        pos_i, vel_i, g_i = pos, vel, gvec

    dM = 2.0 * rho * vol
    Qtt = np.zeros((3, 3))
    if g.dim == 3 or g.coord.value == 0:
        for m in range(3):
            for l in range(3):
                Qtt[l, m] = float(jnp.sum(
                    dM * (vel_i[l] * vel_i[m] + pos_i[l] * g_i[m])))
    else:
        # 2D RZ: phi integrated out (sum_utils.cpp:512-534); cylindrical
        # z-axis = Cartesian x-axis
        dMc = dM / (2.0 * np.pi)
        Qtt[0, 0] = float(jnp.sum(dMc * 2.0 * np.pi *
                                  (vel_i[1] ** 2 + pos_i[1] * g_i[1])))
        Qtt[1, 1] = float(jnp.sum(dMc * np.pi *
                                  (vel_i[0] ** 2 + pos_i[0] * g_i[0])))
        Qtt[2, 2] = Qtt[1, 1]

    # symmetric trace-free part
    Q = 0.5 * (Qtt + Qtt.T) - (np.trace(Qtt) / 3.0) * np.eye(3)

    out = {}
    delta = np.eye(3)
    for axis in range(3):
        n = np.zeros(3)
        n[axis] = 1.0
        r_cm = c.gw_dist * C.parsec * 1.0e3  # kpc -> cm
        P = np.zeros((3, 3, 3, 3))
        for l in range(3):
            for k in range(3):
                for j in range(3):
                    for i in range(3):
                        P[l, k, j, i] = ((delta[k, i] - n[i] * n[k]) *
                                         (delta[l, j] - n[j] * n[l]) -
                                         0.5 * (delta[j, i] - n[i] * n[j]) *
                                         (delta[l, k] - n[k] * n[l]))
        h = np.einsum("lkji,kl->ji", P, Q) * \
            2.0 * C.Gconst / (C.c_light ** 4 * r_cm)
        if axis == 0:
            out["h_plus_1"], out["h_cross_1"] = h[1, 1], h[2, 1]
        elif axis == 1:
            out["h_plus_2"], out["h_cross_2"] = h[2, 2], h[0, 2]
        else:
            out["h_plus_3"], out["h_cross_3"] = h[0, 0], h[1, 0]
    return out
