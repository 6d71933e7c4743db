"""Refinement tagging (reference: AMReX `AMRErrorTag` driven by
`amr.refinement_indicators` + `Castro::errorEst`, `Source/driver/
Castro.cpp:560-615,3131-3160`, plus the `problem_tagging.H` hook).

An indicator is a dict: {field, test, value, max_level} with test one of
value_greater / value_less / gradient / relative_gradient. `field` is a
state name or derived-quantity name."""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp

from castro_tpu.ops.stencil import shifted


def _get_field(sim, u_int, name):
    names = sim.layout.cons_names
    if name in names:
        return u_int[names.index(name)]
    from castro_tpu.driver.derive import registry

    reg = registry(sim)
    if name in reg:
        return reg[name](sim, u_int)
    raise KeyError(f"unknown tagging field '{name}'")


def apply_indicator(sim, u_int, ind: Dict, level: int):
    """Boolean tag array for one indicator on interior data."""
    if ind.get("max_level") is not None and level >= ind["max_level"]:
        return jnp.zeros(u_int.shape[1:], bool)
    f = _get_field(sim, u_int, ind["field"])
    test = ind["test"]
    val = ind["value"]
    if test == "value_greater":
        return f > val
    if test == "value_less":
        return f < val
    if test in ("gradient", "relative_gradient"):
        dim = sim.layout.dim
        tag = jnp.zeros(f.shape, bool)
        for d in range(dim):
            df = jnp.maximum(jnp.abs(shifted(f, 1, d) - f),
                             jnp.abs(f - shifted(f, -1, d)))
            if test == "relative_gradient":
                df = df / jnp.maximum(jnp.abs(f), 1e-300)
            tag = tag | (df > val)
        return tag
    raise ValueError(f"unknown tagging test '{test}'")


def buffer_tags(tags, n_buf: int):
    """Grow tagged regions by n_buf cells (reference amr.n_error_buf)."""
    dim = tags.ndim
    t = tags
    for _ in range(n_buf):
        grown = t
        for d in range(dim):
            grown = grown | shifted(t, 1, d) | shifted(t, -1, d)
        t = grown
    return t


def tag_cells(sim, u_int, indicators: List[Dict], level: int, n_buf: int,
              problem_tagging=None):
    tags = jnp.zeros(u_int.shape[1:], bool)
    for ind in indicators:
        tags = tags | apply_indicator(sim, u_int, ind, level)
    if problem_tagging is not None:
        tags = tags | problem_tagging(sim, u_int, level)
    return buffer_tags(tags, n_buf)
