"""Test configuration: CPU backend with 8 virtual devices, float64.

Golden-physics tests validate against the reference's benchmark curves in
double precision on CPU; multi-chip sharding tests use the 8 virtual
devices. The driver benches on real TPU separately.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
