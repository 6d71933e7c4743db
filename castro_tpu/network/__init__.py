"""Reaction networks (reference: Microphysics networks, selected per problem
via `NETWORK_DIR` in `Exec/*/GNUmakefile`; interface `#include <network.H>`,
`Source/driver/Castro.H:47-51`).

A Network owns species metadata (names, A, Z, binding energies) and, for
reactive networks, a vectorized RHS f(rho, T, X) -> (dX/dt, de/dt) evaluated
on whole arrays at once (TPU-first: one fused RHS over every zone, no
per-zone ODE objects).
"""

from castro_tpu.network.base import Network
from castro_tpu.network.general_null import GeneralNullNetwork
from castro_tpu.network.powerlaw import PowerLawNetwork
from castro_tpu.network.aprox13 import Aprox13Network


def make_network(params) -> Network:
    name = params.network.network_name
    if name in ("general_null", "null"):
        return GeneralNullNetwork(
            spec_names=params.network.spec_names or ("X",),
            aux_names=params.network.aux_names,
        )
    if name == "powerlaw":
        return PowerLawNetwork(
            rtilde=params.network.rtilde,
            nu=params.network.nu,
            specific_q_burn=params.network.specific_q_burn,
            T_burn_ref=params.network.T_burn_ref,
            rho_burn_ref=params.network.rho_burn_ref,
            f_act=params.network.f_act,
        )
    if name == "aprox13":
        return Aprox13Network()
    if name in ("triple_alpha_plus_cago", "triple_alpha"):
        from castro_tpu.network.triple_alpha import TripleAlphaCagoNetwork

        return TripleAlphaCagoNetwork()
    if name == "iso7":
        from castro_tpu.network.iso7 import Iso7Network

        return Iso7Network()
    if name == "aprox19":
        from castro_tpu.network.aprox19 import Aprox19Network

        return Aprox19Network()
    if name == "aprox21":
        from castro_tpu.network.aprox21 import Aprox21Network

        return Aprox21Network()
    if name == "rprox":
        from castro_tpu.network.rprox import RproxNetwork

        return RproxNetwork()
    if name == "nova":
        from castro_tpu.network.nova import NovaNetwork

        return NovaNetwork()
    if name == "subch":
        from castro_tpu.network.subch import SubchNetwork

        return SubchNetwork()
    raise ValueError(f"unknown network '{name}'")


__all__ = ["Network", "GeneralNullNetwork", "PowerLawNetwork", "Aprox13Network", "make_network"]
