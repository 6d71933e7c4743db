"""Post-processing analysis tools (reference `Diagnostics/`: Sedov /
DustCollapse / Radiation radial-profile extractors reading plotfiles)."""

from __future__ import annotations

import numpy as np


def radial_profile(meta, fields, field="density", center=None, nbins=None):
    """Angle-averaged radial profile from a plotfile dict
    (reference Diagnostics/Sedov/main.cpp behavior).

    Returns (r_centers, mean_profile)."""
    dim = meta["dim"]
    n = meta["n_cell"]
    lo, hi = meta["prob_lo"], meta["prob_hi"]
    axes = [lo[d] + (np.arange(n[d]) + 0.5) * (hi[d] - lo[d]) / n[d]
            for d in range(dim)]
    if center is None:
        center = [0.5 * (lo[d] + hi[d]) for d in range(dim)]
    mesh = np.meshgrid(*axes, indexing="ij")
    r = np.sqrt(sum((m - c) ** 2 for m, c in zip(mesh, center)))
    data = fields[field]
    if nbins is None:
        nbins = max(n)
    rmax = r.max()
    ibin = np.minimum((r / rmax * nbins).astype(int), nbins - 1)
    sums = np.bincount(ibin.ravel(), weights=data.ravel(), minlength=nbins)
    cnts = np.bincount(ibin.ravel(), minlength=nbins)
    prof = sums / np.maximum(cnts, 1)
    r_c = (np.arange(nbins) + 0.5) * rmax / nbins
    return r_c, prof


def sedov_analytic(r, t, E=1.0, rho0=1.0, gamma=1.4, nu=3):
    """Approximate Sedov-Taylor shock radius and post-shock state
    (dimensional-analysis xi0 ~ 1; full self-similar profile tooling can
    consume the reference's Verification tables)."""
    xi0 = {1: 1.1, 2: 1.0, 3: 1.15}[nu]
    r_s = xi0 * (E * t * t / rho0) ** (1.0 / (nu + 2))
    rho_post = rho0 * (gamma + 1.0) / (gamma - 1.0)
    return r_s, rho_post
