"""Lightweight scoped phase timers (reference: AMReX TinyProfiler /
BL_PROFILE, summary at exit — `Source/driver/main.cpp:66,240-241`).

Times host-visible phases around jitted segments (the device work inside a
phase is captured via block_until_ready on the phase's outputs when the
caller passes them)."""

from __future__ import annotations

import atexit
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Optional

_records = defaultdict(lambda: [0.0, 0])
_enabled = False


def enable():
    global _enabled
    if not _enabled:
        _enabled = True
        atexit.register(report)


@contextmanager
def profile(name: str, sync=None):
    """Scoped timer; `sync` is an optional array/pytree to block on so
    async device work lands inside the scope."""
    if not _enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
        rec = _records[name]
        rec[0] += time.perf_counter() - t0
        rec[1] += 1


def report(out=None):
    """Print the TinyProfiler-style summary table."""
    if not _records:
        return
    lines = ["", "Castro-TPU phase timers "
             "(incl. time, calls, avg) --------------------"]
    for name, (tot, n) in sorted(_records.items(), key=lambda kv: -kv[1][0]):
        lines.append(f"  {name:32s} {tot:10.3f}s {n:8d} {tot/max(n,1)*1e3:9.2f} ms")
    text = "\n".join(lines)
    print(text) if out is None else out.write(text + "\n")


def reset():
    _records.clear()
