"""Test configuration: CPU backend with 8 virtual devices, float64.

Golden-physics tests validate against the reference's benchmark curves in
double precision on CPU; multi-chip sharding tests use the 8 virtual
devices. The driver benches on real TPU separately.

Note: the environment ships an `axon` TPU plugin registered from
sitecustomize with JAX_PLATFORMS=axon; `jax.config.update` after import is
the reliable way to force the CPU backend for tests (env vars are latched
before conftest runs).
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


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()}, devices: {len(jax.devices())}"
