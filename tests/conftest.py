"""Test config: run everything on a virtual 8-device CPU mesh.

This is the standard JAX way to exercise multi-device sharding without TPU
hardware (SURVEY.md §4).  Must set flags before jax initializes.
"""

import os

# Force CPU even when the environment pins an accelerator platform (the axon
# TPU tunnel lacks host callbacks and serializes compiles) — tests must be
# deterministic and multi-device.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")

# A pytest plugin may import jax before this conftest runs; the env var alone
# is then ignored.  Force the platform through the live config as well.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
