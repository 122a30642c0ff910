"""Test configuration: CPU backend with 8 virtual devices, f64 enabled.

Mirrors the reference test strategy (SURVEY.md §4): physics regression
problems compared against analytic solutions, plus nproc-invariance checks
on a virtual device mesh (the comm_files/mpirun-oversubscribe equivalent).

Note: this environment's sitecustomize registers the axon TPU plugin and
sets JAX_PLATFORMS=axon before conftest runs, so the override must go
through jax.config (the env var is already consumed).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: the suite re-jits the same step functions on
# every run; caching cuts multi-minute reruns to seconds.
jax.config.update("jax_compilation_cache_dir", "/tmp/pion_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
