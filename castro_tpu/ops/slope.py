"""Limited slopes for PLM reconstruction.

Reference: `Source/hydro/slope.H:26-241` — `uslope` (2nd-order MC and
4th-order two-pass MC limiters, flattening applied) and `pslope`
(well-balanced pressure slope with the local hydrostatic gradient
subtracted, `use_pslope`)."""

from __future__ import annotations

import jax.numpy as jnp

from castro_tpu.ops.stencil import shifted


def _mc(dlft, drgt, dcen):
    dsgn = jnp.sign(dcen)
    dlim = jnp.where(dlft * drgt >= 0.0,
                     jnp.minimum(jnp.abs(dlft), jnp.abs(drgt)), 0.0)
    return dsgn * jnp.minimum(jnp.abs(dcen), dlim)


def uslope(q, flatn, ax, order=4):
    """Limited slope of q along ax (per zone).

    order=2: MC limiter; order=4: two-pass 4th-order MC (reference
    plm_limiter=2 default)."""
    qm1 = shifted(q, -1, ax)
    qp1 = shifted(q, 1, ax)
    dlft = 2.0 * (q - qm1)
    drgt = 2.0 * (qp1 - q)
    dcen = 0.25 * (dlft + drgt)
    df = _mc(dlft, drgt, dcen)
    if order == 2:
        return flatn * df
    dfp = shifted(df, 1, ax)
    dfm = shifted(df, -1, ax)
    dq = (4.0 / 3.0) * dcen - (1.0 / 6.0) * (dfp + dfm)
    dsgn = jnp.sign(dcen)
    dlim = jnp.where(dlft * drgt >= 0.0,
                     jnp.minimum(jnp.abs(dlft), jnp.abs(drgt)), 0.0)
    return flatn * dsgn * jnp.minimum(jnp.abs(dq), dlim)


def pslope(p, rho, src_n, flatn, ax, dx, cutoff_density=-1e20):
    """Well-balanced pressure slope: subtract the local hydrostatic
    pressure differences rho*g*dx before limiting, add the in-cell
    gradient back (reference `pslope`, slope.H; the traced state then
    carries only the perturbational pressure slope).

    src_n: the normal-direction acceleration source (srcQ[QUN])."""
    rm1 = shifted(rho, -1, ax)
    rp1 = shifted(rho, 1, ax)
    gm1 = shifted(src_n, -1, ax)
    gp1 = shifted(src_n, 1, ax)

    dlft = p - shifted(p, -1, ax) - 0.25 * (rho + rm1) * (src_n + gm1) * dx
    drgt = shifted(p, 1, ax) - p - 0.25 * (rho + rp1) * (src_n + gp1) * dx
    dlft = 2.0 * dlft
    drgt = 2.0 * drgt
    dcen = 0.25 * (dlft + drgt)
    df = _mc(dlft, drgt, dcen)
    dfp = shifted(df, 1, ax)
    dfm = shifted(df, -1, ax)
    dq = (4.0 / 3.0) * dcen - (1.0 / 6.0) * (dfp + dfm)
    dsgn = jnp.sign(dcen)
    dlim = jnp.where(dlft * drgt >= 0.0,
                     jnp.minimum(jnp.abs(dlft), jnp.abs(drgt)), 0.0)
    dp = flatn * dsgn * jnp.minimum(jnp.abs(dq), dlim)
    # restore the hydrostatic part inside the zone
    dp = dp + rho * src_n * dx
    return jnp.where(rho >= cutoff_density, dp, uslope(p, flatn, ax))
