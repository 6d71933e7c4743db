"""EOS registry (reference: EOS_DIR selection in `Exec/Make.Castro:14-31`)."""

from castro_tpu.eos.base import Eos, EosState
from castro_tpu.eos.gamma_law import GammaLawEos
from castro_tpu.eos.polytrope import PolytropeEos
from castro_tpu.eos.multigamma import MultigammaEos
from castro_tpu.eos.rad_power_law import RadPowerLawEos


def make_eos(params, network=None) -> Eos:
    name = params.eos.eos_name
    if name == "gamma_law":
        return GammaLawEos(
            gamma=params.eos.eos_gamma,
            network=network,
            assume_neutral=bool(params.eos.eos_assume_neutral),
        )
    if name == "polytrope":
        return PolytropeEos(
            K=params.eos.polytrope_K,
            gamma=params.eos.polytrope_gamma,
            mu_e=params.eos.polytrope_mu_e,
            polytrope_type=params.eos.polytrope_type,
            network=network,
        )
    if name == "multigamma":
        gammas = params.extra.get("eos.species_gammas", None)
        if gammas is None:
            gammas = [params.eos.eos_gamma] * (network.nspec if network else 1)
        return MultigammaEos(gammas=gammas, network=network)
    if name == "rad_power_law":
        return RadPowerLawEos(
            gamma=params.eos.eos_gamma,
            const_c_v=params.extra.get("eos.const_c_v", 1.0),
            c_v_exp_m=params.extra.get("eos.c_v_exp_m", 0.0),
            c_v_exp_n=params.extra.get("eos.c_v_exp_n", 0.0),
            network=network,
        )
    if name == "helmholtz":
        from castro_tpu.eos.helmholtz import HelmholtzEos

        return HelmholtzEos(
            network=network,
            use_coulomb=bool(params.extra.get("eos.use_coulomb", 1)))
    raise ValueError(f"unknown EOS '{name}'")


__all__ = [
    "Eos",
    "EosState",
    "GammaLawEos",
    "PolytropeEos",
    "MultigammaEos",
    "RadPowerLawEos",
    "make_eos",
]
