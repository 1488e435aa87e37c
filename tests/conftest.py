"""Test config: run everything on a virtual 8-device CPU mesh.

This is the standard JAX way to exercise multi-device sharding without TPU
hardware (SURVEY.md §4).  Must set flags before jax initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")
