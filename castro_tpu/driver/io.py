"""Checkpoint / plotfile I/O.

Reference: `Source/driver/Castro_io.cpp` — checkPoint :376 (VisMF dumps +
version stamp + state-variable list for restart sanity), restart :67
(back-compat checks, reset_checkpoint_time/step), writePlotFile :853,
writeJobInfo.

TPU design: a checkpoint is a directory with `state.npz` (conserved state
incl. ghosts, exact bits) + `meta.json` (version, time, step, dt, variable
list, params echo). Plotfiles store interior-only state + requested derived
fields. Both formats are plain npz/json so the Diagnostics tools and yt-like
analysis can read them without this package."""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Optional

import numpy as np

CHECKPOINT_VERSION = 1


def _params_dict(params):
    def enc(o):
        if dataclasses.is_dataclass(o):
            return {f.name: enc(getattr(o, f.name)) for f in dataclasses.fields(o)}
        if isinstance(o, (tuple, list)):
            return list(o)
        return o

    return enc(params)


def write_job_info(path, sim):
    """job_info analog (reference writeJobInfo): build/runtime provenance."""
    import jax

    with open(path, "w") as f:
        f.write("==============================================\n")
        f.write(" Castro-TPU Job Information\n")
        f.write("==============================================\n")
        f.write(f"job name: {sim.params.castro.job_name}\n")
        f.write(f"inputs dim: {sim.layout.dim}\n")
        f.write(f"n_cell: {sim.geom.n_cell}\n")
        f.write(f"time: {sim.t}\n")
        f.write(f"step: {sim.step_count}\n")
        f.write(f"wall date: {time.asctime()}\n")
        f.write(f"jax version: {jax.__version__}\n")
        f.write(f"backend: {jax.default_backend()}\n")
        f.write(f"network: {type(sim.network).__name__} "
                f"(nspec={sim.network.nspec})\n")
        f.write(f"EOS: {type(sim.eos).__name__}\n")
        f.write("\n[ parameters ]\n")
        f.write(json.dumps(_params_dict(sim.params), indent=1, default=str))


def write_checkpoint(sim, path: Optional[str] = None, async_writer=None):
    """Exact-restart checkpoint (reference Castro::checkPoint).

    With async_writer (castro_tpu.utils.native.AsyncWriter) the state blob
    is handed to the native threaded writer (CRC32-stamped) and the call
    returns without blocking on disk — the VisMF-async analog."""
    if path is None:
        path = f"{sim.params.amr.check_file}{sim.step_count:05d}"
    os.makedirs(path, exist_ok=True)
    if async_writer is not None:
        import io as _io

        buf = _io.BytesIO()
        np.save(buf, np.asarray(sim.u))
        async_writer.submit(os.path.join(path, "state.cio"), buf.getvalue())
    else:
        arrays = {"u": np.asarray(sim.u)}
        if getattr(sim, "u_rad", None) is not None:
            arrays["u_rad"] = np.asarray(sim.u_rad)
        if getattr(sim, "u_b", None) is not None:
            for d, bb in enumerate(sim.u_b):
                arrays[f"u_b{d}"] = np.asarray(bb)
        np.savez_compressed(os.path.join(path, "state.npz"), **arrays)
    meta = {
        "version": CHECKPOINT_VERSION,
        "time": sim.t,
        "step": sim.step_count,
        "dt": sim.dt,
        "num_zones_advanced": sim.num_zones_advanced,
        "dim": sim.layout.dim,
        "n_cell": list(sim.geom.n_cell),
        "ng": sim.ng,
        "state_variables": list(sim.layout.cons_names),
        "spec_names": list(sim.network.spec_names),
    }
    if getattr(sim, "point_mass", 0.0):
        meta["point_mass"] = sim.point_mass
    if getattr(sim, "problem_checkpoint", None) is not None:
        # reference problem_checkpoint.H hook
        meta["problem"] = sim.problem_checkpoint(sim)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    write_job_info(os.path.join(path, "job_info"), sim)
    return path


def restart(sim, path: str, reset_time: Optional[float] = None,
            reset_step: Optional[int] = None):
    """Restore a Simulation from a checkpoint (reference Castro::restart:
    variable-list sanity check :42, reset_checkpoint_time/step)."""
    import jax.numpy as jnp

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta["version"] > CHECKPOINT_VERSION:
        raise ValueError(f"checkpoint version {meta['version']} too new")
    if meta["state_variables"] != list(sim.layout.cons_names):
        raise ValueError(
            "checkpoint state variables do not match this build: "
            f"{meta['state_variables']} vs {list(sim.layout.cons_names)}")
    cio_path = os.path.join(path, "state.cio")
    if os.path.exists(cio_path):
        import io as _io

        from castro_tpu.utils.native import read_blob

        u = np.load(_io.BytesIO(read_blob(cio_path)))
        sim.u = jnp.asarray(u, dtype=sim.dtype)
    else:
        data = np.load(os.path.join(path, "state.npz"))
        sim.u = jnp.asarray(data["u"], dtype=sim.dtype)
        if "u_rad" in data:
            sim.u_rad = jnp.asarray(data["u_rad"], dtype=sim.dtype)
        if "u_b0" in data:
            sim.u_b = tuple(jnp.asarray(data[f"u_b{d}"], dtype=sim.dtype)
                            for d in range(3))
    sim.t = meta["time"] if reset_time is None else reset_time
    sim.step_count = meta["step"] if reset_step is None else reset_step
    sim.dt = meta["dt"]
    sim.num_zones_advanced = meta.get("num_zones_advanced", 0)
    if "point_mass" in meta:
        sim.point_mass = meta["point_mass"]
    if getattr(sim, "problem_restart", None) is not None:
        # reference problem_restart.H hook
        sim.problem_restart(sim, meta.get("problem"))
    return sim


def write_plotfile(sim, path: Optional[str] = None, small: bool = False):
    """Plotfile: interior state + requested derived fields
    (reference writePlotFile / writeSmallPlotFile)."""
    from castro_tpu.driver.derive import registry

    if path is None:
        prefix = sim.params.amr.plot_file
        path = f"{prefix}{sim.step_count:05d}"
    os.makedirs(path, exist_ok=True)

    ui = np.asarray(sim.interior())
    fields = {}
    names = sim.layout.cons_names
    want = sim.params.amr.small_plot_vars if small else sim.params.amr.plot_vars
    all_state = (not want) or ("ALL" in want)
    for i, name in enumerate(names):
        if all_state or name in want:
            fields[name] = ui[i]

    reg = registry(sim)
    for dname in sim.params.amr.derive_plot_vars:
        if dname == "ALL":
            for k, fn in reg.items():
                fields[k.replace("(", "_").replace(")", "")] = np.asarray(fn(sim, ui))
            break
        if dname in reg:
            fields[dname.replace("(", "_").replace(")", "")] = np.asarray(
                reg[dname](sim, ui))

    np.savez_compressed(os.path.join(path, "fields.npz"), **fields)
    meta = {
        "time": sim.t,
        "step": sim.step_count,
        "dim": sim.layout.dim,
        "n_cell": list(sim.geom.n_cell),
        "prob_lo": list(sim.geom.prob_lo),
        "prob_hi": list(sim.geom.prob_hi),
        "coord_sys": int(sim.geom.coord),
        "fields": sorted(fields.keys()),
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    write_job_info(os.path.join(path, "job_info"), sim)

    # AMReX/BoxLib binary layout alongside the npz (yt / amrvis / fcompare
    # read this directly — reference Castro_io.cpp:853)
    from castro_tpu.driver import amrex_plotfile as apf

    names = list(fields.keys())
    data = np.stack([fields[k] for k in names])
    apf.write_plotfile(
        path, [{"data": data}], names, sim.t,
        list(sim.geom.prob_lo)[: sim.layout.dim],
        list(sim.geom.prob_hi)[: sim.layout.dim],
        level_steps=[sim.step_count], coord=int(sim.geom.coord))
    return path


def read_plotfile(path):
    """Load a plotfile -> (meta dict, {field: ndarray})."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    data = dict(np.load(os.path.join(path, "fields.npz")))
    return meta, data


def write_checkpoint_amr(asim, path: Optional[str] = None):
    """Whole-hierarchy checkpoint (reference AmrLevel::checkPoint over
    levels): per-level states + refinement masks + time metadata."""
    sim0 = asim.sims[0]
    if path is None:
        path = f"{sim0.params.amr.check_file}{asim.step_count:05d}"
    os.makedirs(path, exist_ok=True)
    arrays = {}
    for l in range(asim.max_level + 1):
        arrays[f"u_{l}"] = np.asarray(asim.u[l])
        arrays[f"mask_{l}"] = np.asarray(asim.masks[l])
        if asim.u_rad[l] is not None:
            arrays[f"u_rad_{l}"] = np.asarray(asim.u_rad[l])
        if asim.u_b[l] is not None:
            for d, bb in enumerate(asim.u_b[l]):
                arrays[f"u_b{d}_{l}"] = np.asarray(bb)
        for k, e in enumerate(asim.extra[l]):
            arrays[f"extra_u_{l}_{k}"] = np.asarray(e["u"])
            arrays[f"extra_mask_{l}_{k}"] = np.asarray(e["mask"])
    np.savez_compressed(os.path.join(path, "hierarchy.npz"), **arrays)
    meta = {
        "version": CHECKPOINT_VERSION,
        "time": asim.t,
        "step": asim.step_count,
        "dt": asim.dt,
        "max_level": asim.max_level,
        "num_zones_advanced": asim.num_zones_advanced,
        "n_cell": list(sim0.geom.n_cell),
        "state_variables": list(sim0.layout.cons_names),
        # window geometry: moved/resized windows must survive restart
        # (reference: the BoxArray is part of the checkpoint)
        "windows": [
            None if asim.window[l] is None else
            [[int(v) for v in asim.window[l][0]],
             [int(s) for s in asim.window[l][1]]]
            for l in range(asim.max_level + 1)],
        "extras": [
            [[[int(v) for v in e["ilo"]], [int(s) for s in e["shape"]]]
             for e in asim.extra[l]]
            for l in range(asim.max_level + 1)],
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    write_job_info(os.path.join(path, "job_info"), sim0)
    return path


def restart_amr(asim, path: str):
    """Restore an AmrSimulation hierarchy from a checkpoint."""
    import jax.numpy as jnp

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta["version"] > CHECKPOINT_VERSION:
        raise ValueError(f"checkpoint version {meta['version']} too new")
    if meta["max_level"] != asim.max_level:
        raise ValueError("checkpoint max_level does not match")
    if meta["state_variables"] != list(asim.sims[0].layout.cons_names):
        raise ValueError("checkpoint state variables do not match this build")
    data = np.load(os.path.join(path, "hierarchy.npz"))
    # window geometry FIRST: u/mask shapes and all interlevel transfers
    # depend on the checkpointed window origins/shapes (they may have
    # moved since init)
    if "windows" in meta:
        for l, w in enumerate(meta["windows"]):
            if w is not None:
                asim.window[l] = (np.asarray(w[0], int), tuple(w[1]))
    for l in range(asim.max_level + 1):
        dt_ = asim.dtype
        asim.u[l] = jnp.asarray(data[f"u_{l}"], dtype=dt_)
        asim.masks[l] = jnp.asarray(data[f"mask_{l}"], dtype=bool)
        if f"u_rad_{l}" in data:
            asim.u_rad[l] = jnp.asarray(data[f"u_rad_{l}"], dtype=dt_)
        if f"u_b0_{l}" in data:
            asim.u_b[l] = tuple(
                jnp.asarray(data[f"u_b{d}_{l}"], dtype=dt_)
                for d in range(3))
        ex_meta = meta.get("extras", [[]] * (asim.max_level + 1))[l]
        asim.extra[l] = [
            {"ilo": np.asarray(em[0], int), "shape": tuple(em[1]),
             "u": jnp.asarray(data[f"extra_u_{l}_{k}"], dtype=dt_),
             "mask": jnp.asarray(data[f"extra_mask_{l}_{k}"], dtype=bool),
             "grav_bc": None}
            for k, em in enumerate(ex_meta)]
    asim.t = meta["time"]
    asim.step_count = meta["step"]
    asim.dt = meta["dt"]
    asim.num_zones_advanced = meta.get("num_zones_advanced", 0)
    return asim


def write_plotfile_amr(asim, path: Optional[str] = None):
    """Hierarchy plotfile: per-level interiors + masks + the composited
    finest-grid view (reference writePlotFile writes all levels)."""
    sim0 = asim.sims[0]
    if path is None:
        path = f"{sim0.params.amr.plot_file}{asim.step_count:05d}"
    os.makedirs(path, exist_ok=True)
    arrays = {"composite": np.asarray(asim.composite_interior())}
    for l in range(asim.max_level + 1):
        arrays[f"level_{l}"] = np.asarray(asim.interior(l))
        arrays[f"mask_{l}"] = np.asarray(asim.masks[l])
    np.savez_compressed(os.path.join(path, "fields.npz"), **arrays)
    meta = {
        "time": asim.t,
        "step": asim.step_count,
        "max_level": asim.max_level,
        "n_cell": list(sim0.geom.n_cell),
        "prob_lo": list(sim0.geom.prob_lo),
        "prob_hi": list(sim0.geom.prob_hi),
        "state_variables": list(sim0.layout.cons_names),
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    write_job_info(os.path.join(path, "job_info"), sim0)

    # AMReX multi-level layout: level 0 = whole domain; fine levels are
    # their dense windows positioned by the window origin
    from castro_tpu.driver import amrex_plotfile as apf

    dim = sim0.layout.dim
    names = list(sim0.layout.cons_names)
    levels = []
    rr = 2
    for lev in range(asim.max_level + 1):
        entry = {"data": np.asarray(asim.interior(lev))}
        n_l = [n * rr ** lev for n in sim0.geom.n_cell]
        entry["domain_lo"] = [0] * dim
        entry["domain_hi"] = [n - 1 for n in n_l]
        if lev > 0:
            ilo, _shape = asim.window[lev]
            entry["lo"] = [int(x) for x in np.asarray(ilo)]
        levels.append(entry)
    apf.write_plotfile(path, levels, names, asim.t,
                       list(sim0.geom.prob_lo)[:dim],
                       list(sim0.geom.prob_hi)[:dim], ref_ratio=rr,
                       level_steps=[asim.step_count] * (asim.max_level + 1),
                       coord=int(sim0.geom.coord))
    return path
