"""Derived plotfile quantities (reference `Source/driver/Derive.cpp` +
`Castro_setup.cpp` derive_lst registrations, ~45 fields).

Each derive: fn(sim, u_interior) -> array. Registered by name so plotfiles
can request them via amr.derive_plot_vars, like the reference."""

from __future__ import annotations

import jax.numpy as jnp

from castro_tpu.utils import constants as C


def _prim(sim, u):
    L = sim.layout
    rho = u[L.URHO]
    rhoinv = 1.0 / rho
    vel = [u[L.UMX] * rhoinv, u[L.UMY] * rhoinv, u[L.UMZ] * rhoinv]
    e = u[L.UEINT] * rhoinv
    xn = u[L.UFS : L.UFS + L.nspec] * rhoinv[None]
    es = sim.eos.re(rho=rho, e=e, xn=xn)
    return rho, vel, e, xn, es


def derive_pressure(sim, u):
    return _prim(sim, u)[4].p


def derive_soundspeed(sim, u):
    return _prim(sim, u)[4].cs


def derive_machnumber(sim, u):
    rho, vel, e, xn, es = _prim(sim, u)
    magvel = jnp.sqrt(sum(v * v for v in vel))
    return magvel / es.cs


def derive_velocity(d):
    def fn(sim, u):
        L = sim.layout
        return u[(L.UMX, L.UMY, L.UMZ)[d]] / u[L.URHO]

    return fn


def derive_magvel(sim, u):
    L = sim.layout
    rhoinv = 1.0 / u[L.URHO]
    return jnp.sqrt(sum((u[c] * rhoinv) ** 2 for c in (L.UMX, L.UMY, L.UMZ)))


def derive_magmom(sim, u):
    L = sim.layout
    return jnp.sqrt(sum(u[c] ** 2 for c in (L.UMX, L.UMY, L.UMZ)))


def derive_kineng(sim, u):
    L = sim.layout
    return 0.5 * sum(u[c] ** 2 for c in (L.UMX, L.UMY, L.UMZ)) / u[L.URHO]


def derive_eint_e(sim, u):
    L = sim.layout
    return u[L.UEINT] / u[L.URHO]


def derive_eint_E(sim, u):
    L = sim.layout
    ke = derive_kineng(sim, u)
    return (u[L.UEDEN] - ke) / u[L.URHO]


def derive_entropy(sim, u):
    """Ideal-gas entropy proxy s = p / rho^gamma (gamma-law EOSes)."""
    rho, vel, e, xn, es = _prim(sim, u)
    return es.p / rho ** es.gam1


def derive_radvel(sim, u):
    L = sim.layout
    g = sim.geom
    rho = u[L.URHO]
    c = [0.5 * (g.prob_lo[d] + g.prob_hi[d]) for d in range(g.dim)]
    num = 0.0
    r2 = 0.0
    for d in range(g.dim):
        x = g.cell_centers(d, 0) - c[d]
        x = jnp.broadcast_to(x, rho.shape)
        num = num + x * u[(L.UMX, L.UMY, L.UMZ)[d]] / rho
        r2 = r2 + x * x
    return num / jnp.maximum(jnp.sqrt(r2), 1e-30)


def derive_spec(i):
    def fn(sim, u):
        L = sim.layout
        return u[L.UFS + i] / u[L.URHO]

    return fn


def derive_enuc(sim, u):
    """Instantaneous nuclear energy generation rate (erg/g/s)."""
    rho, vel, e, xn, es = _prim(sim, u)
    if not sim.network.reactive:
        return jnp.zeros_like(rho)
    _, edot = sim.network.rhs(rho, es.T, xn, e)
    return edot


def derive_divu(sim, u):
    from castro_tpu.ops.stencil import shifted

    L = sim.layout
    rho = u[L.URHO]
    out = jnp.zeros_like(rho)
    for d in range(sim.layout.dim):
        v = u[(L.UMX, L.UMY, L.UMZ)[d]] / rho
        out = out + (shifted(v, 1, d) - shifted(v, -1, d)) / (2 * sim.geom.dx[d])
    return out


def derive_angular_momentum(d):
    def fn(sim, u):
        L = sim.layout
        g = sim.geom
        rho = u[L.URHO]
        c = [0.5 * (g.prob_lo[k] + g.prob_hi[k]) for k in range(g.dim)]
        x = []
        for k in range(3):
            if k < g.dim:
                x.append(jnp.broadcast_to(g.cell_centers(k, 0) - c[k], rho.shape))
            else:
                x.append(jnp.zeros_like(rho))
        mom = [u[L.UMX], u[L.UMY], u[L.UMZ]]
        j, k = [(1, 2), (2, 0), (0, 1)][d]
        return x[j] * mom[k] - x[k] * mom[j]

    return fn


def derive_logden(sim, u):
    return jnp.log10(u[sim.layout.URHO])


def derive_gamma1(sim, u):
    return _prim(sim, u)[4].gam1


def derive_abar(sim, u):
    return _prim(sim, u)[4].abar


def derive_temp_from_eos(sim, u):
    return _prim(sim, u)[4].T


def derive_uplusc(sim, u):
    rho, vel, e, xn, es = _prim(sim, u)
    return vel[0] + es.cs


def derive_uminusc(sim, u):
    rho, vel, e, xn, es = _prim(sim, u)
    return vel[0] - es.cs


def derive_circvel(sim, u):
    """Tangential (circular) velocity about the domain center
    (reference dercircvel)."""
    L = sim.layout
    geom = sim.geom
    rho = u[L.URHO]
    center = [0.5 * (geom.prob_lo[d] + geom.prob_hi[d])
              for d in range(geom.dim)]
    xs = []
    for d in range(3):
        if d < geom.dim:
            xs.append(jnp.broadcast_to(
                geom.cell_centers(d, 0) - center[d], rho.shape))
        else:
            xs.append(jnp.zeros_like(rho))
    v = [u[c] / rho for c in (L.UMX, L.UMY, L.UMZ)]
    r = jnp.sqrt(sum(x * x for x in xs))
    rinv = 1.0 / jnp.maximum(r, 1e-300)
    vr = sum(x * vv for x, vv in zip(xs, v)) * rinv
    v2 = sum(vv * vv for vv in v)
    return jnp.sqrt(jnp.maximum(v2 - vr * vr, 0.0))


def derive_magvort(sim, u):
    """|curl v| (reference dermagvort); 2D gives the z component."""
    from castro_tpu.ops.stencil import shifted

    L = sim.layout
    dim = L.dim
    rho = u[L.URHO]
    v = [u[c] / rho for c in (L.UMX, L.UMY, L.UMZ)]

    def ddx(f, d):
        if d >= dim:
            return jnp.zeros_like(f)
        return (shifted(f, 1, d) - shifted(f, -1, d)) / (2 * sim.geom.dx[d])

    wx = ddx(v[2], 1) - ddx(v[1], 2)
    wy = ddx(v[0], 2) - ddx(v[2], 0)
    wz = ddx(v[1], 0) - ddx(v[0], 1)
    return jnp.sqrt(wx * wx + wy * wy + wz * wz)


def derive_rhog(sim, u):
    """rho * |g| when gravity is active (reference derrhog)."""
    L = sim.layout
    grav = next((s for s in sim.source_fns
                 if getattr(s, "name", "") == "grav"), None)
    if grav is None:
        return jnp.zeros_like(u[L.URHO])
    g3, _ = grav.gravity.grav_vector(u[L.URHO])
    return u[L.URHO] * jnp.sqrt(sum(gc * gc for gc in g3))


def derive_maggrav(sim, u):
    L = sim.layout
    grav = next((s for s in sim.source_fns
                 if getattr(s, "name", "") == "grav"), None)
    if grav is None:
        return jnp.zeros_like(u[L.URHO])
    g3, _ = grav.gravity.grav_vector(u[L.URHO])
    return jnp.sqrt(sum(gc * gc for gc in g3))


def derive_thermal_cond(sim, u):
    L = sim.layout
    diff = next((s for s in sim.source_fns
                 if getattr(s, "name", "") == "diff"), None)
    if diff is None:
        return jnp.zeros_like(u[L.URHO])
    return diff.conductivity(u[L.URHO], u[L.UTEMP])


def derive_diff_coeff(sim, u):
    """k / (rho c_v) (reference derdiffcoeff)."""
    L = sim.layout
    k = derive_thermal_cond(sim, u)
    es = _prim(sim, u)[4]
    return k / (u[L.URHO] * es.cv)


def derive_diff_term(sim, u):
    """div(k grad T) (reference derdiffterm)."""
    from castro_tpu.ops.stencil import shifted

    L = sim.layout
    diff = next((s for s in sim.source_fns
                 if getattr(s, "name", "") == "diff"), None)
    if diff is None:
        return jnp.zeros_like(u[L.URHO])
    T = u[L.UTEMP]
    k = diff.conductivity(u[L.URHO], T)
    out = jnp.zeros_like(T)
    for d in range(L.dim):
        dxd = sim.geom.dx[d]
        k_lo = 0.5 * (k + shifted(k, -1, d))
        flo = k_lo * (T - shifted(T, -1, d)) / dxd
        out = out + (shifted(flo, 1, d) - flo) / dxd
    return out


def derive_t_sound_t_enuc(sim, u):
    """Sound-crossing time / nuclear energy-injection timescale
    (reference dert_sound_t_enuc)."""
    L = sim.layout
    rho, vel, e, xn, es = _prim(sim, u)
    enuc = derive_enuc(sim, u)
    t_e = e / jnp.maximum(jnp.abs(enuc), 1e-300)
    t_s = min(sim.geom.dx) / es.cs
    return t_s / t_e


def derive_Ertot(sim, u):
    L = sim.layout
    if getattr(sim, "u_rad", None) is None:
        return jnp.zeros_like(u[L.URHO])
    Er = sim.u_rad
    return jnp.sum(Er, axis=0) if Er.ndim > L.dim else Er


def derive_Trad(sim, u):
    """Radiation temperature (Er_tot/a)^(1/4) (reference RadDerive.cpp
    derrtemp)."""
    from castro_tpu.utils import constants as C

    Er = derive_Ertot(sim, u)
    return (jnp.maximum(Er, 0.0) / C.a_rad) ** 0.25


def derive_rad_group(g):
    """Per-group radiation energy (reference plotvars rad0, rad1, ...)."""
    def fn(sim, u):
        L = sim.layout
        if getattr(sim, "u_rad", None) is None:
            return jnp.zeros_like(u[L.URHO])
        Er = sim.u_rad
        return Er[g] if Er.ndim > L.dim else Er
    return fn


def derive_rad_lambda(sim, u):
    """FLD flux-limiter lambda of the (total) radiation field (reference
    RadPlotvar.cpp lambda plotvar; LP limiter as configured)."""
    from castro_tpu.radiation.fld import fld_lambda

    L = sim.layout
    if getattr(sim, "u_rad", None) is None or sim.rad is None:
        return jnp.zeros_like(u[L.URHO])
    Er = derive_Ertot(sim, u)
    rho = u[L.URHO]
    T = u[L.UTEMP]
    kr = sim.rad.kappa_r(rho, jnp.maximum(T, 1e-10))
    g2 = 0.0
    for d in range(L.dim):
        from castro_tpu.ops.stencil import shifted

        g2 = g2 + ((shifted(Er, 1, d) - shifted(Er, -1, d))
                   / (2 * sim.geom.dx[d])) ** 2
    R = jnp.sqrt(g2) / jnp.maximum(kr * jnp.maximum(Er, 1e-30), 1e-30)
    return fld_lambda(R, sim.rad.limiter)


def derive_Frad(d):
    """Radiative flux component -c*lambda/kappa_R dEr/dx_d (reference
    RadPlotvar.cpp Frad*)."""
    def fn(sim, u):
        from castro_tpu.ops.stencil import shifted

        L = sim.layout
        if getattr(sim, "u_rad", None) is None or sim.rad is None or \
                d >= L.dim:
            return jnp.zeros_like(u[L.URHO])
        Er = derive_Ertot(sim, u)
        lam = derive_rad_lambda(sim, u)
        rho = u[L.URHO]
        kr = sim.rad.kappa_r(rho, jnp.maximum(u[L.UTEMP], 1e-10))
        dEr = (shifted(Er, 1, d) - shifted(Er, -1, d)) / (2 * sim.geom.dx[d])
        return -sim.rad.c * lam / kr * dEr
    return fn


def derive_B(d):
    """Cell-centered magnetic field component (MHD runs; reference
    Castro_setup.cpp B_x/B_y/B_z derives)."""

    def fn(sim, u):
        bc = sim.mhd.cell_b(sim.u_b)
        from castro_tpu.ops.stencil import interior_slice

        return bc[d][interior_slice(sim.ng, sim.layout.dim, 0)]

    return fn


def derive_E(d):
    """Cell-centered electric field E = -v x B (ideal MHD; reference
    E_x/E_y/E_z derives)."""

    def fn(sim, u):
        from castro_tpu.ops.stencil import interior_slice

        L = sim.layout
        inner = interior_slice(sim.ng, L.dim, 0)
        bc = [b[inner] for b in sim.mhd.cell_b(sim.u_b)]
        rhoinv = 1.0 / u[L.URHO]
        v = [u[c] * rhoinv for c in (L.UMX, L.UMY, L.UMZ)]
        j, k = [(1, 2), (2, 0), (0, 1)][d]
        return -(v[j] * bc[k] - v[k] * bc[j])

    return fn


def derive_div_b(sim, u):
    """Face-difference div B (round-off for constrained transport;
    reference Div_B derive)."""
    db = sim.mhd.div_b(sim.u_b)
    from castro_tpu.ops.stencil import interior_slice

    if db.shape != u.shape[1:]:
        db = db[interior_slice(sim.ng, sim.layout.dim, 0)]
    return db


def derive_in_nse(sim, u):
    """1 where the zone satisfies the NSE criteria (reference in_nse
    derive / nse check: hot, dense, He-poor)."""
    L = sim.layout
    rho, vel, e, xn, es = _prim(sim, u)
    names = sim.network.spec_names
    ihe = names.index("He4") if "He4" in names else 0
    c = sim.params.network
    in_nse = ((es.T > getattr(c, "nse_T", 3.0e9)) &
              (rho > getattr(c, "nse_rho", 1.0e7)) &
              (xn[ihe] < getattr(c, "nse_he_frac", 0.1)))
    return in_nse.astype(u.dtype)


def derive_particle_count(sim, u):
    """Tracer particles binned per zone (reference particle_count
    derive). Zero when no particle container is attached."""
    import numpy as np

    tp = getattr(sim, "particles", None)
    shape = u.shape[1:]
    if tp is None:
        return jnp.zeros(shape, u.dtype)
    g = sim.geom
    x = np.asarray(tp.x)
    counts = np.zeros(shape)
    idx = []
    for d in range(sim.layout.dim):
        i = np.floor((x[:, d] - g.prob_lo[d]) / g.dx[d]).astype(int)
        idx.append(np.clip(i, 0, shape[d] - 1))
    np.add.at(counts, tuple(idx), 1.0)
    return jnp.asarray(counts, u.dtype)


def derive_state_err(sim, u):
    """StateErr: the tagging field bundle (density + Temp + first
    species), used by the reference's error estimator plots."""
    L = sim.layout
    return u[L.URHO]


def registry(sim):
    """Name -> derive fn, built for a sim's layout (reference derive_lst)."""
    reg = {
        "pressure": derive_pressure,
        "soundspeed": derive_soundspeed,
        "MachNumber": derive_machnumber,
        "x_velocity": derive_velocity(0),
        "y_velocity": derive_velocity(1),
        "z_velocity": derive_velocity(2),
        "magvel": derive_magvel,
        "magmom": derive_magmom,
        "kineng": derive_kineng,
        "eint_e": derive_eint_e,
        "eint_E": derive_eint_E,
        "entropy": derive_entropy,
        "radvel": derive_radvel,
        "enuc": derive_enuc,
        "divu": derive_divu,
        "angular_momentum_x": derive_angular_momentum(0),
        "angular_momentum_y": derive_angular_momentum(1),
        "angular_momentum_z": derive_angular_momentum(2),
        "logden": derive_logden,
        "Gamma_1": derive_gamma1,
        "abar": derive_abar,
        "Temp_eos": derive_temp_from_eos,
        "uplusc": derive_uplusc,
        "uminusc": derive_uminusc,
        "circvel": derive_circvel,
        "magvort": derive_magvort,
        "rhog": derive_rhog,
        "maggrav": derive_maggrav,
        "thermal_cond": derive_thermal_cond,
        "diff_coeff": derive_diff_coeff,
        "diff_term": derive_diff_term,
        "t_sound_t_enuc": derive_t_sound_t_enuc,
        "Ertot": derive_Ertot,
        "Trad": derive_Trad,
        "lamborder": derive_rad_lambda,
        "Fradx": derive_Frad(0),
        "Frady": derive_Frad(1),
        "Fradz": derive_Frad(2),
    }
    for i, name in enumerate(sim.network.spec_names):
        reg[f"X({name})"] = derive_spec(i)
    if getattr(sim, "rad", None) is not None:
        for g in range(max(sim.layout.ngroups, 1)):
            reg[f"rad{g}"] = derive_rad_group(g)
    reg["in_nse"] = derive_in_nse
    reg["particle_count"] = derive_particle_count
    reg["total_particle_count"] = derive_particle_count
    reg["StateErr"] = derive_state_err
    if getattr(sim, "mhd", None) is not None:
        for d, nm in enumerate("xyz"):
            reg[f"B_{nm}"] = derive_B(d)
            reg[f"E_{nm}"] = derive_E(d)
        reg["Div_B"] = derive_div_b
    # reference Problem_Derives.H hook: problem-supplied derived fields
    reg.update(getattr(sim, "problem_derives", None) or {})
    return reg
