"""Test configuration: 8 virtual CPU devices, x64 enabled.

Sharding tests exercise multi-chip semantics on a virtual CPU mesh
(there is at most one real TPU in CI); numerical tests run f64 on CPU.

Note: the harness exports JAX_PLATFORMS=axon and the env var cannot be
overridden from here; the programmatic config update below does win.
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
