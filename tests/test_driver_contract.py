"""Guards for the external driver contract: __graft_entry__ and bench.py."""
import json
import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_entry_compiles_and_runs():
    import __graft_entry__ as g
    fn, args = g.entry()
    price, ci = jax.jit(fn)(*args)
    assert 9.5 < float(price) < 11.5  # ~BS(100,100,4.879%,20%,1y)
    assert float(ci) > 0


@pytest.mark.slow
def test_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as g
    g.dryrun_multichip(8)  # raises on any failure


@pytest.mark.slow
def test_dryrun_multichip_fresh_process_like_driver():
    """Regression for round 1's red MULTICHIP artifact: the driver imports
    jax first and sets NO XLA_FLAGS, so the bootstrap must be able to request
    the 8-device virtual host platform itself (jax_num_cpu_devices)."""
    import os
    import subprocess

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_ENABLE_X64")}
    code = ("import jax\n"  # jax pre-imported, like the driver harness
            "import __graft_entry__ as g\n"
            "g.dryrun_multichip(8)\n"
            "print('MULTICHIP_OK')\n")
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=600, cwd=str(Path(__file__).resolve().parent.parent))
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "MULTICHIP_OK" in proc.stdout


def test_bench_emits_contract_json(capsys):
    import bench
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["value"] > 0
    # both fields are independently rounded for display
    assert rec["vs_baseline"] == pytest.approx(rec["value"] / 1e9, abs=5e-4)
