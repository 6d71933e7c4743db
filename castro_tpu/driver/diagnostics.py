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
