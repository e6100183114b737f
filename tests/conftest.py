"""Test configuration: force CPU with 8 virtual devices (the standard JAX trick for
testing multi-chip sharding without hardware) and enable float64 for parity checks
against scipy reference solves."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the environment's sitecustomize force-registers the TPU backend and overrides
# jax_platforms after import; override it back so tests run on the virtual CPU mesh
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: the suite re-jits the same fixed-shape kernels every run;
# caching cuts repeat wall time by minutes
jax.config.update("jax_compilation_cache_dir", "/tmp/hsolve_test_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
