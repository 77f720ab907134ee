"""Test configuration.

Multi-chip sharding is tested on a *virtual 8-device CPU mesh*:
``xla_force_host_platform_device_count=8`` makes the host platform
expose 8 XLA CPU devices, so ``jax.sharding.Mesh`` / ``shard_map`` /
``ppermute`` exercise the exact multi-chip code paths (collectives and
all) without TPU hardware.  float64/complex128 is enabled so the jnp
engine can be validated to 1e-10 against the complex128 numpy oracle.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
