"""Problem setups (reference: `Exec/*` problem directories; each provides a
`problem_initialize_state_data`-style init hook plus inputs defaults)."""

from castro_tpu.problems.util import fill_from_prim

__all__ = ["fill_from_prim"]
