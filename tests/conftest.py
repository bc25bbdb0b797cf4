"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding tests use 8 virtual
CPU devices (SURVEY.md §4 implications). The environment ships
``JAX_PLATFORMS=axon`` (one real TPU via a tunnel); a pytest plugin imports
jax before this conftest runs, so we must override via jax.config (effective
until the first backend initialization) rather than env vars.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
