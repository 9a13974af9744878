"""Test configuration: force CPU with 8 virtual devices.

Tests must be deterministic and must exercise multi-chip sharding without
TPU hardware, so the whole suite runs on the CPU backend with an 8-device
virtual topology (sharding tests build a Mesh over them). Pallas kernels
run in interpret mode on CPU (handled inside the ops).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize registers the axon TPU backend in every
# process and can override the platform; force CPU at the config level.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
