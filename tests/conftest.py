"""Test bootstrap: force CPU backend with 8 virtual devices.

Must run before the first ``import jax`` so tests exercise the multi-device
sharding path on any machine (SURVEY.md §4 "distributed without a cluster").
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
