"""Test harness: CPU backend with 8 virtual devices, x64 enabled.

The multi-chip sharding tests emulate a TPU slice on the host platform
(SURVEY.md §4: the TPU-world analogue of multi-node testing without a
cluster).  Environment must be set before jax initializes.
"""
import os

# Env for backends that initialize lazily (XLA host device count).
_PLATFORM = os.environ.get("MCTPU_TEST_PLATFORM", "cpu")
os.environ["JAX_ENABLE_X64"] = "1"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# jax may already be imported at interpreter startup (site hooks registering
# accelerator plugins), freezing env-derived config; config.update still wins.
# Default to the host platform: suites must be fast and mesh-testable; tests
# needing a real TPU are marked @pytest.mark.tpu and opt in via
# MCTPU_TEST_PLATFORM=tpu (which keeps the site default platform — the TPU
# plugin may register under a vendor name, e.g. "axon", so we must not force
# the literal string "tpu").
if _PLATFORM != "tpu":
    jax.config.update("jax_platforms", _PLATFORM)
jax.config.update("jax_enable_x64", True)


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    The full lane compiles many hundreds of XLA:CPU programs in one
    process; past roughly 250 tests the CPU backend segfaults inside
    ``backend_compile_and_load`` (reproduced twice at the same suite
    offset, while every module passes standalone — an upstream JIT
    memory issue, not a test bug).  Releasing executables at module
    teardown keeps the live-program count bounded; modules rarely share
    compiled programs, so the recompile cost is near zero.
    """
    yield
    jax.clear_caches()


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="run the heavy statistical gates (the full lane; also "
             "enabled by MCTPU_TEST_SLOW=1)")


def pytest_collection_modifyitems(config, items):
    has_tpu = jax.default_backend() == "tpu"
    skip_tpu = pytest.mark.skip(reason="requires a real TPU device")
    run_slow = (config.getoption("--slow")
                or os.environ.get("MCTPU_TEST_SLOW") == "1"
                or "slow" in config.getoption("-m"))
    skip_slow = pytest.mark.skip(
        reason="slow lane (pass --slow or MCTPU_TEST_SLOW=1)")
    for item in items:
        if "tpu" in item.keywords and not has_tpu:
            item.add_marker(skip_tpu)
        if "slow" in item.keywords and not run_slow:
            item.add_marker(skip_slow)
