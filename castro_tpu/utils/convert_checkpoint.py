"""Checkpoint conversion tools (reference `Util/ConvertCheckpoint`):
"embiggen" a checkpoint onto a domain `grown_factor` times larger, with
the original data either centered (star_at_center=1) or at the corner.
The reference uses this to restart small-domain runs (e.g. a relaxed
star) inside a larger box; `castro.grown_factor` then records the ratio.

Usage:
    from castro_tpu.utils.convert_checkpoint import embiggen
    embiggen("chk00100", "chk00100_big", grown_factor=2,
             star_at_center=True)
    # then build the Simulation with the enlarged amr.n_cell /
    # geometry.prob_lo/hi and restart() from the new checkpoint.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np


def embiggen(path_in: str, path_out: str, grown_factor: int = 2,
             star_at_center: bool = True,
             ambient_state: Optional[Sequence[float]] = None):
    """Write an enlarged copy of a single-level checkpoint.

    The new interior is `grown_factor * n_cell` per dimension; the
    original data block is placed at the center (or the low corner) and
    the remainder filled with `ambient_state` (default: the state of the
    original domain's low corner cell, the reference's ambient fill).
    Returns (path_out, new_n_cell).
    """
    if grown_factor < 1 or int(grown_factor) != grown_factor:
        raise ValueError("grown_factor must be a positive integer")
    with open(os.path.join(path_in, "meta.json")) as f:
        meta = json.load(f)
    data = np.load(os.path.join(path_in, "state.npz"))
    u = np.asarray(data["u"])

    dim = meta["dim"]
    ng = meta["ng"]
    n_old = meta["n_cell"]
    n_new = [n * grown_factor for n in n_old]

    shape_new = (u.shape[0],) + tuple(n + 2 * ng for n in n_new)
    corner = tuple([slice(None)] + [slice(ng, ng + 1)] * dim)
    if ambient_state is None:
        amb = u[corner].reshape(u.shape[0], *([1] * dim))
    else:
        amb = np.asarray(ambient_state, dtype=u.dtype).reshape(
            u.shape[0], *([1] * dim))
    big = np.broadcast_to(amb, shape_new).copy()

    offs = []
    for d in range(dim):
        if star_at_center:
            offs.append(ng + (n_new[d] - n_old[d]) // 2)
        else:
            offs.append(ng)
    src = tuple([slice(None)] + [slice(ng, ng + n_old[d])
                                 for d in range(dim)])
    dst = tuple([slice(None)] + [slice(offs[d], offs[d] + n_old[d])
                                 for d in range(dim)])
    big[dst] = u[src]

    os.makedirs(path_out, exist_ok=True)
    np.savez_compressed(os.path.join(path_out, "state.npz"), u=big)
    meta_out = dict(meta)
    meta_out["n_cell"] = n_new
    meta_out["grown_factor"] = grown_factor
    meta_out["star_at_center"] = int(bool(star_at_center))
    with open(os.path.join(path_out, "meta.json"), "w") as f:
        json.dump(meta_out, f, indent=1)
    # carry the job_info along if present
    ji = os.path.join(path_in, "job_info")
    if os.path.exists(ji):
        with open(ji) as f:
            txt = f.read()
        with open(os.path.join(path_out, "job_info"), "w") as f:
            f.write(txt + f"\nembiggened: grown_factor={grown_factor} "
                    f"star_at_center={int(bool(star_at_center))}\n")
    return path_out, n_new


def grown_params(params, grown_factor: int = 2,
                 star_at_center: bool = True):
    """Params for the enlarged domain matching `embiggen`'s placement:
    n_cell scaled, prob_lo/hi grown about the center (or the low corner
    fixed)."""
    amr = params.amr
    geo = params.geometry
    dim = len(amr.n_cell)
    n_new = tuple(n * grown_factor for n in amr.n_cell)
    lo, hi = list(geo.prob_lo), list(geo.prob_hi)
    for d in range(dim):
        L = hi[d] - lo[d]
        if star_at_center:
            pad_lo = L * (grown_factor - 1) / 2.0
            # integer cell offset used by embiggen: align exactly
            off = (n_new[d] - amr.n_cell[d]) // 2
            dx = L / amr.n_cell[d]
            pad_lo = off * dx
            lo[d] = lo[d] - pad_lo
            hi[d] = lo[d] + L * grown_factor
        else:
            hi[d] = lo[d] + L * grown_factor
    p = params.with_ns("amr", n_cell=n_new)
    p = p.with_ns("geometry", prob_lo=tuple(lo) + tuple(geo.prob_lo[dim:]),
                  prob_hi=tuple(hi) + tuple(geo.prob_hi[dim:]))
    return p
