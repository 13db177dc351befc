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

# self-provision the optional native I/O library so its tests run
# (falls back to a skip if no toolchain is available)
import subprocess  # noqa: E402

_CSRC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "csrc")
if not os.path.exists(os.path.join(_CSRC, "libpovar_io.so")):
    try:
        subprocess.run(
            ["make", "-C", _CSRC, "all"],
            check=False,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        pass
