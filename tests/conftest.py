"""Test configuration.

Multi-chip sharding is tested on a *virtual 8-device CPU mesh*:
``xla_force_host_platform_device_count=8`` makes the host platform
expose 8 XLA CPU devices, so ``jax.sharding.Mesh`` / ``shard_map`` /
``ppermute`` exercise the exact multi-chip code paths (collectives and
all) without TPU hardware.  float64/complex128 is enabled so the jnp
engine can be validated to 1e-10 against the complex128 numpy oracle.

NOTE: this image preloads jax via a sitecustomize hook with
``JAX_PLATFORMS=axon`` (a remote-TPU tunnel where every dispatch is a
network round-trip), so the platform must be overridden through
``jax.config`` — the env var alone is read too early to help.  Set
``QST_TEST_PLATFORM`` to run the suite on another platform.
"""
import os
import sys

_platform = os.environ.get("QST_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
jax.config.update("jax_enable_x64", True)
