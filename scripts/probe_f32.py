"""Probe: per-phase compile time + f32 finiteness for the full-physics step.

Run: JAX_PLATFORMS=cpu python scripts/probe_f32.py
"""
import os
import sys
import time
import warnings

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

warnings.simplefilter("error", RuntimeWarning)  # catch overflow-in-cast

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np


def main():
    from __graft_entry__ import _fullphys_sim

    print("backend:", jax.default_backend(), jax.devices())
    t0 = time.time()
    try:
        sim = _fullphys_sim(n=16, dtype="float32")
    except RuntimeWarning as w:
        print("TRACE WARNING during sim init:", w)
        import traceback; traceback.print_exc()
        warnings.simplefilter("default", RuntimeWarning)
        sim = _fullphys_sim(n=16, dtype="float32")
        warnings.simplefilter("error", RuntimeWarning)
    print(f"init: {time.time()-t0:.1f}s  u finite={bool(np.isfinite(np.asarray(sim.u)).all())}")

    L = sim.layout
    u = sim.u
    dt = np.float32(1e-4)

    def timed(name, fn, *args):
        t0 = time.time()
        try:
            out = jax.block_until_ready(fn(*args))
            ok = jax.tree_util.tree_all(jax.tree_util.tree_map(
                lambda x: bool(np.isfinite(np.asarray(x)).all()), out))
            print(f"{name:28s} {time.time()-t0:7.1f}s  finite={ok}")
            return out
        except RuntimeWarning as w:
            print(f"{name:28s} TRACE WARNING: {w}")
            import traceback; traceback.print_exc()
            warnings.simplefilter("default", RuntimeWarning)
            out = jax.block_until_ready(fn(*args))
            warnings.simplefilter("error", RuntimeWarning)
            ok = jax.tree_util.tree_all(jax.tree_util.tree_map(
                lambda x: bool(np.isfinite(np.asarray(x)).all()), out))
            print(f"{name:28s} (redo)  finite={ok}")
            return out

    # 1. burner (half-dt Strang)
    if sim.reactor is not None:
        shk = u[L.USHK] if L.shock_var else None
        r = timed("reactor.react", jax.jit(
            lambda u_: sim.reactor.react(u_, 0.5 * dt, shk)[0]), u)

    # 2. gravity field (Poisson MG + multipole BCs)
    from castro_tpu.ops.stencil import interior_slice
    grav = next(s for s in sim.source_fns if getattr(s, "name", "") == "grav")
    rho_i = u[(L.URHO,) + interior_slice(sim.ng, L.dim, 0)]
    g3, phi = timed("gravity.grav_vector",
                    jax.jit(lambda r_: grav.gravity.grav_vector(r_)), rho_i)

    # 2b. just the multipole BCs
    mp = timed("multipole_bcs", jax.jit(
        lambda r_: grav.gravity._multipole_bcs(r_, sim.geom)), rho_i)

    # 3. hydro (ctoprim + ctu)
    from castro_tpu.ops.advection_util import ctoprim
    from castro_tpu.ops.ctu import ctu_hydro

    def hydro(u_):
        c = sim.params.castro
        q, qaux = ctoprim(u_, L, sim.eos, sim.cfg.small_dens,
                          max(c.small_temp, 1e-200))
        u_new, fluxes, qes, shk = ctu_hydro(u_, q, qaux, None, dt, sim.geom,
                                            L, sim.cfg)
        return u_new
    timed("ctu_hydro", jax.jit(hydro), u)

    # 4. full step
    timed("full _step_impl", jax.jit(
        lambda u_, dt_: sim._step_impl(u_, dt_, 0.0)[:3]), u, dt)


if __name__ == "__main__":
    main()
