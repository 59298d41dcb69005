"""Phase timing — the cudaEvent bracketing of the reference, TPU-style.

The reference times every engine phase with cudaEvent pairs (RNG setup,
allocs, kernel, D2H, reduction: ``MonteCarloKernel.cu:297-428``) and each
driver times whole CPU/GPU runs to print a speedup (``vanillaOpt.cu:67-86``).
On TPU most of those phases no longer exist as host-visible events (XLA owns
memory and transfers, the RNG has no setup kernel, and the reduction is fused
into the program), so the honest per-phase mapping is:

=====================  =======================================================
reference phase        TPU equivalent (how to measure)
=====================  =======================================================
RNG setup kernel       none — counter-based streams need no state pool
host/device allocs     XLA arena allocs; visible only in a profiler trace
constant-mem upload    ``h2d`` phase of :func:`phase_breakdown` (device_put)
kernel execution       ``execute`` phase (compiled call + block_until_ready)
D2H partials copy      ``d2h`` phase (``np.asarray`` of the tiny result)
final host reduction   inside ``execute`` (fused psum/pairwise combine)
(not in reference)     ``trace+lower`` / ``compile`` — the JIT cost the
                       reference pays at build time instead
=====================  =======================================================

:func:`phase_breakdown` produces exactly this table for one pricing call via
the AOT API.  For instruction-level phases (DMA vs MXU vs VPU occupancy),
wrap a run in :func:`profile_trace`::

    with profile_trace("/tmp/mctpu-trace"):
        sync(engine.price_vanilla(opt, n, key, cfg))
    # then: tensorboard --logdir /tmp/mctpu-trace  (Profile tab), or open
    # the .trace.json.gz in perfetto.dev; Pallas kernels appear as
    # "custom-call" / "mosaic" ops with per-op duration.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax

__all__ = ["PhaseTimer", "sync", "profile_trace", "phase_breakdown"]


def sync(x=None):
    """Block until device work backing ``x`` (or all work) is done."""
    if x is not None:
        jax.tree_util.tree_map(
            lambda leaf: leaf.block_until_ready()
            if hasattr(leaf, "block_until_ready") else leaf, x)
    else:
        jax.effects_barrier()
    return x


class PhaseTimer:
    """Accumulates named phase durations; prints a compact report.

    Usage::

        t = PhaseTimer()
        with t.phase("kernel"):
            sync(run())
        print(t.report())
    """

    def __init__(self):
        self.phases: list[tuple[str, float]] = []

    @contextlib.contextmanager
    def phase(self, name: str, sync_result: Callable | None = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases.append((name, time.perf_counter() - t0))

    def __getitem__(self, name: str) -> float:
        return sum(dt for n, dt in self.phases if n == name)

    def report(self) -> str:
        w = max((len(n) for n, _ in self.phases), default=0)
        return "\n".join(f"{n:<{w}}  {dt * 1e3:10.3f} ms"
                         for n, dt in self.phases)


def phase_breakdown(fn, *args):
    """Reference-style per-phase timing of one pricing call (see module doc).

    Splits a ``jax.jit(fn)(*args)`` into trace+lower / compile / h2d /
    execute / d2h phases via the AOT API — the TPU analogue of the
    reference's cudaEvent bracketing (``MonteCarloKernel.cu:297-428``).
    Returns ``(result, PhaseTimer)``.
    """
    import numpy as np

    t = PhaseTimer()
    jfn = jax.jit(fn)
    with t.phase("trace+lower"):
        lowered = jfn.lower(*args)
    with t.phase("compile"):
        compiled = lowered.compile()
    with t.phase("h2d"):
        args_dev = sync(jax.device_put(args))
    with t.phase("execute"):
        out = compiled(*args_dev)
        # Fetch-closed barrier: through remote tunnels block_until_ready
        # can report completion before the device has executed anything
        # (benchmarks/ROOFLINE.md, "honest timing"); materializing one
        # result leaf is the only barrier that proves execution.  The
        # results here are tiny (per-block partial rows), so the transfer
        # cost is negligible next to the kernel.
        leaves = jax.tree_util.tree_leaves(out)
        if leaves and hasattr(leaves[0], "__array__"):
            np.asarray(leaves[0])
        else:
            sync(out)
    with t.phase("d2h"):
        jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, "__array__") else x, out)
    return out, t


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Optional jax.profiler trace around a block (no-op when dir is None)."""
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
