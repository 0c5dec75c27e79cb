"""Test environment: force an 8-device virtual CPU mesh.

The reference has no test suite (SURVEY.md §4); we test on CPU so the suite
runs anywhere, with Pallas kernels exercised in interpreter mode and
sharding validated on a virtual 8-device mesh.
"""

import os

# Force CPU regardless of the session's JAX_PLATFORMS (an attached TPU
# would otherwise serve every test compile over a remote tunnel).
# Set AWQ_TPU_TEST_PLATFORM=tpu to run the suite against real hardware.
os.environ["JAX_PLATFORMS"] = os.environ.get("AWQ_TPU_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: XLA:CPU compiles are slow on this VM and
# dominate test wall time otherwise. A SEPARATE dir from the TPU bench
# processes: a TPU-attached process writes CPU AOT entries with a
# different machine-feature snapshot, and loading those from the test
# process SEGFAULTS XLA:CPU (observed: cpu_aot_loader '+prefer-no-scatter
# not supported on the host machine' followed by a crash in
# backend_compile_and_load).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/awq_tpu_jax_cache_cpu"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# A pytest plugin may have imported jax before this conftest ran, pinning
# the session's TPU backend; force a re-init on CPU.
import sys  # noqa: E402

if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.clear_backends()
    except Exception:
        pass


def pytest_sessionstart(session):
    import jax

    assert jax.default_backend() == "cpu" or os.environ.get(
        "AWQ_TPU_TEST_PLATFORM"
    ), f"tests must run on CPU, got {jax.default_backend()}"
    assert len(jax.devices()) >= 8 or os.environ.get(
        "AWQ_TPU_TEST_PLATFORM"
    ), "expected 8 virtual CPU devices"


# ---- per-module executable cleanup ------------------------------------------
# The full suite compiles ~250 XLA:CPU executables in one process; past
# ~the round-3 count the XLA:CPU JIT starts SEGFAULTing mid-compile
# (observed in backend_compile_and_load at suite position ~58%, while the
# same test passes in isolation). Dropping compiled-executable references
# between modules keeps the live JIT footprint bounded.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    import jax

    try:
        jax.clear_caches()
    except Exception:
        pass


# ---- per-test timeout -------------------------------------------------------
# One hung Pallas interpret test must not stall the whole suite (the heavy
# tier is ~19 min on this 1-core VM; pytest-xdist would not help here).
# SIGALRM can't interrupt a C-level XLA compile, but it catches the usual
# failure mode: a Python-level interpret loop that stopped converging.
import signal  # noqa: E402

import pytest  # noqa: E402

_TEST_TIMEOUT = int(os.environ.get("AWQ_TPU_TEST_TIMEOUT", "900"))


@pytest.hookimpl(wrapper=True)
def pytest_runtest_call(item):
    if not (_TEST_TIMEOUT and hasattr(signal, "SIGALRM")):
        return (yield)

    # @pytest.mark.timeout_s(N) overrides for legitimately long tests
    # (the 70B-geometry rehearsal compiles ~10 min on this 1-core VM
    # and slower still under a loaded 4-worker suite)
    mark = item.get_closest_marker("timeout_s")
    limit = int(mark.args[0]) if mark and mark.args else _TEST_TIMEOUT

    def _timeout(signum, frame):
        raise TimeoutError(
            f"test exceeded its {limit}s timeout "
            "(AWQ_TPU_TEST_TIMEOUT / @pytest.mark.timeout_s)")

    # hard backstop at 2x: SIGALRM cannot interrupt a hung C-level XLA
    # compile — faulthandler dumps every thread's traceback and KILLS
    # the (xdist worker) process, which pytest reports as a crash
    # instead of stalling the whole run
    import faulthandler

    faulthandler.dump_traceback_later(limit * 2, exit=True)
    old = signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(limit)
    try:
        return (yield)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
        faulthandler.cancel_dump_traceback_later()
