"""castro_tpu — a TPU-native (JAX/XLA/Pallas) compressible astrophysical
radiation/MHD/hydrodynamics framework with adaptive mesh refinement.

Re-designed from scratch for TPU hardware with the capabilities of the
Castro code (BoxLib-Codes/Castro; see /root/reference). This is NOT a port:
state lives in fixed-shape component-major arrays `[ncomp, nx, ny, nz]`,
the CTU/PPM hydro pipeline is a fused XLA/Pallas program batched over
patches, elliptic solves are matrix-free geometric multigrid in JAX, and
distribution is `jax.sharding.Mesh` + `shard_map` with halo exchange over
ICI instead of MPI.

Reference parity map lives in SURVEY.md at the repo root; docstrings cite
reference files (path:line) for the behavior they reproduce.
"""

from castro_tpu.config import Params, load_inputs, parse_inputs_text
from castro_tpu.state import StateLayout
from castro_tpu.geometry import Geometry, CoordSys

__version__ = "0.1.0"

__all__ = [
    "Params",
    "load_inputs",
    "parse_inputs_text",
    "StateLayout",
    "Geometry",
    "CoordSys",
]
