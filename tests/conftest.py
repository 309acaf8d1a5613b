"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

jax may already be imported by pytest plugin autoloading before this file
runs (so env vars alone are too late); jax.config.update still works as
long as no backend has been initialized yet. Real-TPU benchmarking happens
in bench.py (which does NOT use this conftest).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
