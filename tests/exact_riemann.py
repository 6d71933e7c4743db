"""Test-local shim: the exact Riemann oracle lives in the package
(castro_tpu.utils.exact_riemann, the Util/exact_riemann analog)."""

from castro_tpu.utils.exact_riemann import *  # noqa: F401,F403
from castro_tpu.utils.exact_riemann import solution, sample, star_state  # noqa: F401
