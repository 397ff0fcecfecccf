"""Test configuration: run all tests on CPU with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware
(the torch reference has no distributed tests at all — SURVEY.md §4).

This environment pre-imports jax via a sitecustomize on PYTHONPATH and pins
a 1-device TPU platform, so setting JAX_PLATFORMS in os.environ here is too
late (jax reads it at import).  The backend itself is still *lazy*, though:
as long as no jax.devices()/computation has run yet, retargeting via
jax.config.update("jax_platforms", "cpu") plus XLA_FLAGS takes effect.  If a
backend was somehow already initialized on a non-CPU platform, fail loudly
rather than letting mesh tests die one by one.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # effective when jax is not pre-imported
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # effective when jax IS pre-imported
jax.config.update("jax_enable_x64", False)

# Persistent XLA:CPU compilation cache: the suite compiles the same tiny
# pipeline programs from dozens of independent Runner/jit instances (and
# again on every pytest invocation); the persistent cache dedupes them by
# HLO, cutting suite wall time roughly in half. Same-machine AOT reuse —
# the loader's machine-feature E-logs are a known cosmetic artifact of
# tuning flags (prefer-no-scatter) being compared as ISA features.
# Opt out with SEEDVR2_TEST_NO_JAX_CACHE=1.
if os.environ.get("SEEDVR2_TEST_NO_JAX_CACHE") != "1":
    jax.config.update("jax_compilation_cache_dir", "/tmp/seedvr2_jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


_devs = jax.devices()
if len(_devs) < 8 or _devs[0].platform != "cpu":
    raise RuntimeError(
        "conftest could not obtain an 8-device CPU mesh "
        f"(got {len(_devs)} {_devs[0].platform} device(s)); a jax backend was "
        "likely initialized before pytest started. Run pytest in a fresh "
        "process."
    )
