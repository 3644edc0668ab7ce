"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not required for tests: sharding/collective code is
validated on fake CPU devices via ``xla_force_host_platform_device_count``
(the strategy called out in SURVEY.md §4). These env vars must be set
before the first ``import jax`` anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
