"""Multi-host (multi-process) initialization and mesh construction.

TPU-native replacement for the reference's MPI bootstrap
(`ParallelDescriptor::StartParallel`, `main.cpp:64-90` amrex::Initialize):
on a TPU pod each host owns a subset of chips; `jax.distributed`
coordinates them, after which every host traces the SAME global program
and XLA partitions it over the global device mesh (SURVEY.md §5.8 / P2).

Usage (one call near the top of a driver script, before touching
devices):

    from castro_tpu.parallel import multihost
    multihost.initialize()                   # no-op single-process
    mesh = multihost.global_mesh((1, 2, 4))  # devices across ALL hosts

Single-process (one host, N chips) and multi-process (pod slices,
launched by the TPU runtime with JAX_COORDINATOR_ADDRESS etc. or by
explicit arguments) both land on the same code path: arrays are
addressable per host but globally sharded, and the collectives in
`halo.py` / `solvers/multigrid.py` ride ICI across host boundaries
exactly as within a host.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

import jax

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-process.

    Resolution order (mirrors jax.distributed.initialize):
      1. explicit arguments,
      2. cluster auto-detection (TPU pod runtime, SLURM, GKE set
         JAX_COORDINATOR_ADDRESS / megascale env vars),
      3. single-process fallback: no-op.

    Returns True when a multi-process runtime is active. Idempotent.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    env_multi = (os.environ.get("JAX_COORDINATOR_ADDRESS")
                 or os.environ.get("COORDINATOR_ADDRESS"))
    if coordinator_address or num_processes or env_multi:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    # else: single-process — jax.devices() already sees all local chips
    _initialized = True
    return jax.process_count() > 1


def global_mesh(shape: Sequence[int],
                axis_names: Tuple[str, ...] = ("x", "y", "z"),
                devices=None) -> "jax.sharding.Mesh":
    """Build a Mesh over ALL devices (every host's chips), shaped
    `shape` (padded with leading 1s to len(axis_names)).

    The device order groups chips on the same host contiguously along
    the LAST (fastest-varying) mesh axis so halo exchanges along that
    axis stay intra-host where possible (ICI locality; scaling-book
    recipe: innermost mesh dim = closest devices)."""
    from jax.sharding import Mesh

    devices = list(jax.devices()) if devices is None else list(devices)
    shape = tuple(shape)
    if len(shape) < len(axis_names):
        shape = (1,) * (len(axis_names) - len(shape)) + shape
    n = int(np.prod(shape))
    if n != len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, "
                         f"have {len(devices)}")
    dev_arr = np.array(devices).reshape(shape)
    return Mesh(dev_arr, axis_names[:len(shape)])


def process_local_slice(global_shape: Tuple[int, ...], mesh,
                        axis_names: Tuple[Optional[str], ...]):
    """For host-side IO (checkpoint write/read): the index slab of the
    global interior grid owned by THIS process, per spatial dim — the
    analog of the reference's DistributionMapping-driven FabArray
    ownership. Returns a tuple of slices."""
    out = []
    for d, name in enumerate(axis_names):
        if name is None or name not in mesh.axis_names:
            out.append(slice(None))
            continue
        size = mesh.shape[name]
        # which shard indices along this axis live on this process
        axis = mesh.axis_names.index(name)
        dev_idx = np.moveaxis(
            np.array([[d2.process_index for d2 in row]
                      for row in np.atleast_2d(mesh.devices)]).reshape(
                          mesh.devices.shape), axis, 0)
        mine = [i for i in range(size)
                if (dev_idx[i] == jax.process_index()).any()]
        if not mine:
            out.append(slice(0, 0))
            continue
        chunk = global_shape[d] // size
        out.append(slice(min(mine) * chunk, (max(mine) + 1) * chunk))
    return tuple(out)
