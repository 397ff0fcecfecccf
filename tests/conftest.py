"""Test configuration: run all tests on CPU with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware
(the torch reference has no distributed tests at all — SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even when the env targets TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
