"""Multi-process mesh rehearsal: the code path a real pod slice takes.

SURVEY.md §2 promises multi-host via ``jax.distributed.initialize``; the
in-suite sharding tests cover multi-*device* meshes but a single process.
Here two OS processes, 4 virtual CPU devices each, build one global
8-device mesh over gloo (the CPU stand-in for DCN) and price through the
unmodified engine.  Per-block counter RNG + the fixed-order f64 combine
make the result bitwise equal to the same pinned geometry in one process —
asserted against an in-suite single-process run, and between the two
workers (the replicated output must agree everywhere).
"""
import json
import os
import socket
import subprocess
import sys

import jax
import pytest

import mctpu
from mctpu import EngineConfig, VanillaOption

_WORKER = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_mesh_bitwise_matches_single_process():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, f"127.0.0.1:{port}", "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    assert all(o["n_devices"] == 8 for o in outs)
    # Every process sees the same replicated result.
    strip = lambda o: {k: v for k, v in o.items() if k != "pid"}
    assert strip(outs[0]) == strip(outs[1])

    # Single-process reference: same pinned geometry, no mesh.
    opt = VanillaOption(s=100.0, k=100.0, r=0.048790, v=0.2, t=1.0)
    cfg = EngineConfig(backend="xla", num_blocks=64, rows=8,
                       auto_shrink=False)
    ref = mctpu.price_vanilla(opt, 1 << 18, jax.random.key(7), cfg)

    assert outs[0]["price"] == repr(float(ref.price))
    assert outs[0]["ci"] == repr(float(ref.ci))
    assert outs[0]["sum_p"] == repr(float(ref.sum_p))
    assert outs[0]["sum_p2"] == repr(float(ref.sum_p2))
