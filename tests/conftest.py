"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before jax is imported anywhere — pytest imports conftest first.
Real-TPU benchmarking happens in bench.py (which does NOT import this).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_debug_nans", False)
