"""AMReX/BoxLib plotfile writer + reader (yt-compatible).

Implements the on-disk format the reference emits from
`Castro::writePlotFile` (`Source/driver/Castro_io.cpp:853-1100`, AMReX
`VisMF`): a text `Header` (HyperCLaw-V1.1), per-level `Level_N/Cell_H`
multifab headers, and `Cell_D_xxxxx` binary FAB files (native
little-endian float64, Fortran order, component-major). Files written
here load in yt (`yt.load` boxlib frontend) and in AMReX tooling
(`amrvis`, `fcompare`), replacing the npz-only plotfiles of round 1.

The reader round-trips our own files and also reads single-level
reference-generated plotfiles for golden comparisons.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_FAB_HEADER = ("FAB ((8, (64 11 52 0 1 12 0 1023)),(8, (8 7 6 5 4 3 2 1)))"
               "{box} {ncomp}\n")


def _box_str(lo, hi, dim):
    lo3 = tuple(lo) + (0,) * (3 - dim)
    hi3 = tuple(hi) + (0,) * (3 - dim)
    t3 = (0,) * 3
    fmt = lambda v: "(" + ",".join(str(x) for x in v[:dim]) + ")"  # noqa
    return f"({fmt(lo3)} {fmt(hi3)} {fmt(t3)})"


def _parse_box(s):
    """'((0,0,0) (63,63,63) (0,0,0))' -> (lo, hi)."""
    parts = s.strip()[1:-1].split(") (")
    lo = tuple(int(x) for x in parts[0].strip("()").split(","))
    hi = tuple(int(x) for x in parts[1].strip("()").split(","))
    return lo, hi


def write_plotfile(path: str,
                   levels: Sequence[Dict],
                   varnames: Sequence[str],
                   time: float,
                   prob_lo: Sequence[float],
                   prob_hi: Sequence[float],
                   ref_ratio: int = 2,
                   level_steps: Optional[Sequence[int]] = None,
                   coord: int = 0):
    """Write an AMReX plotfile.

    levels: list of dicts per level:
      {'data': array [ncomp, nx(, ny(, nz))] (cell-centered, no ghosts),
       'lo': global cell index of the first cell (default zeros),
       'domain_lo'/'domain_hi': level domain index bounds (defaults to
       the data extent)}
    """
    nlev = len(levels)
    dim = levels[0]["data"].ndim - 1
    ncomp = len(varnames)
    level_steps = list(level_steps or [0] * nlev)

    os.makedirs(path, exist_ok=True)

    dx0 = [(prob_hi[d] - prob_lo[d]) /
           (levels[0].get("domain_hi",
                          [s - 1 for s in levels[0]["data"].shape[1:]])[d]
            - levels[0].get("domain_lo", [0] * dim)[d] + 1)
           for d in range(dim)]

    lines = ["HyperCLaw-V1.1", str(ncomp)]
    lines += list(varnames)
    lines.append(str(dim))
    lines.append(repr(float(time)))
    lines.append(str(nlev - 1))
    lines.append(" ".join(repr(float(x)) for x in prob_lo[:dim]))
    lines.append(" ".join(repr(float(x)) for x in prob_hi[:dim]))
    lines.append(" ".join(str(ref_ratio) for _ in range(nlev - 1)))
    dom_strs = []
    for lev, L in enumerate(levels):
        dlo = L.get("domain_lo", [0] * dim)
        dhi = L.get("domain_hi", [s - 1 for s in L["data"].shape[1:]])
        dom_strs.append(_box_str(dlo, dhi, dim))
    lines.append(" ".join(dom_strs))
    lines.append(" ".join(str(s) for s in level_steps))
    for lev in range(nlev):
        dxl = [d / ref_ratio ** lev for d in dx0]
        lines.append(" ".join(repr(float(d)) for d in dxl))
    lines.append(str(coord))
    lines.append("0")

    for lev, L in enumerate(levels):
        data = np.asarray(L["data"], dtype=np.float64)
        lo = list(L.get("lo", [0] * dim))
        hi = [lo[d] + data.shape[1 + d] - 1 for d in range(dim)]
        dxl = [d / ref_ratio ** lev for d in dx0]
        glo = [prob_lo[d] + lo[d] * dxl[d] for d in range(dim)]
        ghi = [prob_lo[d] + (hi[d] + 1) * dxl[d] for d in range(dim)]

        lines.append(f"{lev} 1 {float(time)!r}")
        lines.append(str(level_steps[lev]))
        for d in range(dim):
            lines.append(f"{glo[d]!r} {ghi[d]!r}")
        lines.append(f"Level_{lev}/Cell")

        ldir = os.path.join(path, f"Level_{lev}")
        os.makedirs(ldir, exist_ok=True)

        # binary FAB: Fortran order (x fastest), component-major
        fab = np.ascontiguousarray(
            np.transpose(data, (0,) + tuple(range(dim, 0, -1))))
        box = _box_str(lo, hi, dim)
        fab_head = _FAB_HEADER.format(box=box, ncomp=ncomp).encode()
        dfile = "Cell_D_00000"
        with open(os.path.join(ldir, dfile), "wb") as f:
            offset = 0
            f.write(fab_head)
            f.write(fab.astype("<f8").tobytes())

        mins = [float(data[c].min()) for c in range(ncomp)]
        maxs = [float(data[c].max()) for c in range(ncomp)]
        hl = ["1", "0", str(ncomp), "0",
              "(1 0", f"{box}", ")", "1",
              f"FabOnDisk: {dfile} {offset}", "",
              f"1,{ncomp}",
              ",".join(repr(v) for v in mins) + ",", "",
              f"1,{ncomp}",
              ",".join(repr(v) for v in maxs) + ",", ""]
        with open(os.path.join(ldir, "Cell_H"), "w") as f:
            f.write("\n".join(hl))

    with open(os.path.join(path, "Header"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def read_plotfile(path: str):
    """Read an AMReX plotfile (all grids per level assembled into the
    level domain window). Returns dict with 'time', 'varnames', 'levels':
    list of {'data': [ncomp, ...], 'lo': ..., 'domain_lo/hi': ...},
    'prob_lo', 'prob_hi', 'dx'."""
    with open(os.path.join(path, "Header")) as f:
        tok = f.read().splitlines()
    assert tok[0].startswith("HyperCLaw"), tok[0]
    i = 1
    ncomp = int(tok[i]); i += 1
    varnames = tok[i:i + ncomp]; i += ncomp
    dim = int(tok[i]); i += 1
    time = float(tok[i]); i += 1
    finest = int(tok[i]); i += 1
    prob_lo = [float(x) for x in tok[i].split()]; i += 1
    prob_hi = [float(x) for x in tok[i].split()]; i += 1
    i += 1  # ref_ratio line (may be empty)
    dom_line = tok[i]; i += 1
    # split '((a) (b) (c)) ((d)...)' into per-level boxes
    doms = []
    depth = 0
    start = 0
    for j, ch in enumerate(dom_line):
        if ch == "(":
            if depth == 0:
                start = j
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                doms.append(dom_line[start:j + 1])
    i += 1  # level_steps
    dxs = []
    for lev in range(finest + 1):
        dxs.append([float(x) for x in tok[i].split()]); i += 1
    i += 2  # coord, bwidth

    levels = []
    for lev in range(finest + 1):
        head = tok[i].split(); i += 1
        ngrids = int(head[1])
        i += 1  # level steps
        i += ngrids * dim  # grid physical bounds
        rel = tok[i]; i += 1

        ldir = os.path.join(path, os.path.dirname(rel))
        with open(os.path.join(ldir, "Cell_H")) as f:
            h = f.read().splitlines()
        k = 4
        nbx = int(h[k].split()[0].strip("(")); k += 1
        boxes = []
        for b in range(nbx):
            boxes.append(_parse_box(h[k])); k += 1
        k += 1  # ')'
        nfod = int(h[k]); k += 1
        fods = []
        for b in range(nfod):
            parts = h[k].split(); k += 1
            fods.append((parts[1], int(parts[2])))

        dlo, dhi = _parse_box(doms[lev])
        shape = tuple(dhi[d] - dlo[d] + 1 for d in range(dim))
        data = np.full((ncomp,) + shape, np.nan)
        for (blo, bhi), (dfile, off) in zip(boxes, fods):
            with open(os.path.join(ldir, dfile), "rb") as f:
                f.seek(off)
                hdr = f.readline().decode()
                assert hdr.startswith("FAB"), hdr
                bshape = tuple(bhi[d] - blo[d] + 1 for d in range(dim))
                n = int(np.prod(bshape)) * ncomp
                arr = np.frombuffer(f.read(n * 8), dtype="<f8")
            arr = arr.reshape((ncomp,) + bshape[::-1])
            arr = np.transpose(arr, (0,) + tuple(range(dim, 0, -1)))
            sl = tuple(slice(blo[d] - dlo[d], bhi[d] - dlo[d] + 1)
                       for d in range(dim))
            data[(slice(None),) + sl] = arr
        levels.append({"data": data, "lo": dlo, "domain_lo": dlo,
                       "domain_hi": dhi})
    return {"time": time, "varnames": varnames, "levels": levels,
            "prob_lo": prob_lo, "prob_hi": prob_hi, "dx": dxs}
