"""Test harness setup.

All tests run on CPU with 8 virtual devices so data-parallel `shard_map`
paths are exercised without multi-chip hardware (the driver separately
dry-runs the multi-chip path; bench.py runs on the real TPU chip).
Must run before the first `import jax` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
