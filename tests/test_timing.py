"""Phase timer tests (the cudaEvent-bracketing replacement)."""
import time

from mctpu.utils.timing import PhaseTimer, profile_trace, sync


def test_phase_timer_accumulates():
    t = PhaseTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("b"):
        time.sleep(0.005)
    with t.phase("a"):
        time.sleep(0.01)
    assert t["a"] >= 0.02
    assert t["b"] >= 0.005
    report = t.report()
    assert "a" in report and "ms" in report
    assert len(report.splitlines()) == 3


def test_sync_passthrough():
    import jax.numpy as jnp
    x = {"y": jnp.ones(4)}
    assert sync(x) is x
    sync(None)


def test_profile_trace_noop():
    with profile_trace(None):
        pass


def test_phase_breakdown_reports_all_phases():
    import jax.numpy as jnp

    from mctpu.utils.timing import phase_breakdown

    def fn(x):
        return jnp.sum(x * x)

    out, t = phase_breakdown(fn, jnp.arange(8.0))
    assert float(out) == float(jnp.sum(jnp.arange(8.0) ** 2))
    names = [n for n, _ in t.phases]
    assert names == ["trace+lower", "compile", "h2d", "execute", "d2h"]
    assert all(dt >= 0 for _, dt in t.phases)
