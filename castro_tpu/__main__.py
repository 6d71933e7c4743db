"""Command-line driver: `python -m castro_tpu <inputs> [problem=<name>]
[ns.key=value ...]` — the analog of the reference executable
(`Source/driver/main.cpp:33`: parse inputs, build the Amr hierarchy, run
the coarse-timestep loop, print the FOM)."""

from __future__ import annotations

import sys

from castro_tpu.config import load_inputs, parse_inputs_text

PROBLEMS = {}


def _register_problems():
    from castro_tpu.problems import (acoustic_pulse, dust_collapse, sedov,
                                     sod, detonation)

    PROBLEMS.update({
        "sedov": (sedov.make_params, sedov.problem_init),
        "sod": (sod.make_params, sod.problem_init),
        "acoustic_pulse": (acoustic_pulse.make_params, acoustic_pulse.problem_init),
        "dust_collapse": (dust_collapse.make_params, dust_collapse.problem_init),
        "detonation": (detonation.make_params, detonation.problem_init),
    })
    # problems with custom construction (BC closures etc.)
    from castro_tpu.problems import double_mach, flame_wave, hse_convergence

    PROBLEMS["double_mach"] = ("builder", double_mach.build)
    PROBLEMS["flame_wave"] = ("builder", flame_wave.build)
    PROBLEMS["hse_convergence"] = ("builder", hse_convergence.build)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(__doc__)
        print("problems:", ", ".join(sorted(PROBLEMS)) or "(register first)")
        return 1
    # persistent XLA compile cache: remote/tunneled TPU compiles take
    # minutes per program — warm CLI runs must hit disk
    import os as _os

    import jax as _jax

    try:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.join(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__))), ".jax_cache"))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    _register_problems()

    inputs_path = None
    problem = None
    overrides = []
    for a in argv:
        if a.startswith("problem="):
            problem = a.split("=", 1)[1]
        elif "=" in a:
            overrides.append(a.replace("=", " = ", 1))
        else:
            inputs_path = a

    if problem is None:
        # infer from the inputs path (reference problems live in dirs
        # named after the problem)
        for name in PROBLEMS:
            if inputs_path and name.replace("_", "") in \
                    inputs_path.lower().replace("_", "").replace("-", ""):
                problem = name
                break
    if problem is None or problem not in PROBLEMS:
        print(f"unknown problem (have: {sorted(PROBLEMS)})")
        return 1

    entry = PROBLEMS[problem]
    if entry[0] == "builder":
        sim = entry[1]()
        for ov in overrides:
            ns_key, val = ov.split(" = ")
            print(f"note: override {ns_key} ignored for builder problems")
        sim.init_data()
        sim.run(verbose=True)
        return 0
    make_params, init = entry
    params = make_params()
    if inputs_path:
        params = load_inputs(inputs_path, base=params)
    if overrides:
        params = parse_inputs_text("\n".join(overrides), base=params)

    from castro_tpu.driver.sim import Simulation
    from castro_tpu.driver.amr import AmrSimulation

    if params.amr.max_level > 0:
        sim = AmrSimulation(params, problem_init=init)
    else:
        sim = Simulation(params, problem_init=init)
    sim.run(verbose=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
