"""Phase timing — the cudaEvent bracketing of the reference, TPU-style.

The reference times every engine phase with cudaEvent pairs (RNG setup,
allocs, kernel, D2H, reduction: ``MonteCarloKernel.cu:297-428``) and each
driver times whole CPU/GPU runs to print a speedup (``vanillaOpt.cu:67-86``).
On TPU most of those phases no longer exist (XLA owns memory and transfers);
what remains meaningful is wall time around a synchronized jitted call, plus
optional ``jax.profiler`` traces for kernel-level inspection.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax

__all__ = ["PhaseTimer", "sync", "profile_trace"]


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


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Optional jax.profiler trace around a block (no-op when dir is None)."""
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
