"""Test environment: force an 8-device virtual CPU mesh.

The reference has no test suite (SURVEY.md §4); we test on CPU so the suite
runs anywhere, with Pallas kernels exercised in interpreter mode and
sharding validated on a virtual 8-device mesh.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: XLA:CPU compiles are slow on this VM and
# dominate test wall time otherwise.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/awq_tpu_jax_cache"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
