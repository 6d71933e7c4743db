"""Miller-Colella shock flattening (reference `Castro::uflatten`,
`Source/hydro/flatten.cpp:13-167`): per-direction coefficient from pressure
jumps + velocity convergence, evaluated at the zone and its upwind neighbor,
combined across directions with a min. Stencil reach: 3 zones.
"""

from __future__ import annotations

import jax.numpy as jnp

from castro_tpu.ops.stencil import shifted

SHKTST = 0.33
ZCUT1 = 0.75
ZCUT2 = 0.85
DZCUT = 1.0 / (ZCUT2 - ZCUT1)
SMALL_PRES = 1.0e-200


def uflatten(q, layout, pres_comp=None):
    """Return flatn[grid] in [0,1]; 1 = no flattening.

    `pres_comp` selects the pressure used for shock detection (default
    QPRES; radiation runs also flatten on QPTOT, Castro_ctu_hydro.cpp:236-239).
    """
    L = layout
    dim = L.dim
    p = q[L.QPRES if pres_comp is None else pres_comp]
    base_ndim = p.ndim
    flatn = jnp.ones_like(p)

    # dtype-aware floor: 1e-200 flushes to zero in f32 and would make
    # zeta = 0/0 in uniform regions
    small = max(SMALL_PRES, float(jnp.finfo(p.dtype).tiny))

    for d in range(dim):
        ax = base_ndim - dim + d
        vel = q[L.velocity_index(d)]

        dp = shifted(p, 1, ax) - shifted(p, -1, ax)
        denom = jnp.maximum(small, jnp.abs(shifted(p, 2, ax) - shifted(p, -2, ax)))
        zeta = jnp.abs(dp) / denom
        z = jnp.clip(DZCUT * (zeta - ZCUT1), 0.0, 1.0)
        tst = jnp.where(shifted(vel, -1, ax) - shifted(vel, 1, ax) >= 0.0, 1.0, 0.0)
        tmp = jnp.minimum(shifted(p, 1, ax), shifted(p, -1, ax))
        chi = jnp.where(jnp.abs(dp) > SHKTST * tmp, tst, 0.0)
        zchi = chi * z

        # evaluate the same quantity at the upwind neighbor i-ishft
        zchi_m = shifted(zchi, -1, ax)  # ishft = +1 (dp > 0)
        zchi_p = shifted(zchi, 1, ax)  # ishft = -1 (dp <= 0)
        zchi2 = jnp.where(dp > 0.0, zchi_m, zchi_p)

        flatn = jnp.minimum(flatn, 1.0 - jnp.maximum(zchi, zchi2))
    return flatn
