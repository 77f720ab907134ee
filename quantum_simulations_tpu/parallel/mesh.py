"""Device-mesh utilities for the sharded statevector.

The state is a flat (2^n,) complex array sharded on its single axis
over a 1-D mesh of D = 2^d devices: device s holds global indices
[s * 2^k, (s+1) * 2^k) with k = n - d.  Little-endian amplitude
indexing means qubits 0..k-1 are local and qubit k+b is mesh-axis
bit b — the TPU-native version of the reference's chunk scheme
(``wenbo_engine/runner/single_node.py:199-216``) where chunk files
stand in for shards.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "s"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D mesh over a power-of-two device count."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = 1 << int(math.log2(len(devices)))
    if n_devices & (n_devices - 1):
        raise ValueError(f"n_devices must be a power of two, got {n_devices}")
    if n_devices > len(devices):
        raise ValueError(f"need {n_devices} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_devices]), (AXIS,))


def device_bits(mesh: Mesh) -> int:
    return int(math.log2(mesh.size))


def state_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(AXIS))


def shard_width(mesh: Mesh, n: int) -> int:
    """k = number of local qubits for an n-qubit state on this mesh."""
    d = device_bits(mesh)
    if d > n:
        raise ValueError(f"mesh of {mesh.size} devices too large for n={n}")
    return n - d


def zero_state_sharded(mesh: Mesh, n: int, dtype=jnp.complex64) -> jax.Array:
    """|0...0> as a sharded global array (amplitude 1 at index 0)."""
    sharding = state_sharding(mesh)

    @jax.jit
    def init():
        psi = jnp.zeros(1 << n, dtype=dtype)
        psi = psi.at[0].set(1.0)
        return lax_with_sharding(psi, sharding)

    return init()


def lax_with_sharding(x, sharding):
    return jax.lax.with_sharding_constraint(x, sharding)


def put_state(mesh: Mesh, psi, dtype=jnp.complex64) -> jax.Array:
    """Device-put a host statevector with the mesh sharding."""
    from ..utils.transfer import upload_array

    arr = np.asarray(psi).astype(jnp.dtype(dtype).name)
    return upload_array(arr, sharding=state_sharding(mesh))


def zero_state_planar_sharded(mesh: Mesh, n: int, fdtype=jnp.float32):
    """|0...0> as sharded (re, im) f32 planes — no complex form.

    The capacity tier's init: at n >= 29 a complex64 vector would cost
    2x the plane footprint, so the state is born planar (cf.
    ``ops.dense.zero_state_planar`` for the single-buffer form).
    """
    sharding = state_sharding(mesh)

    @jax.jit
    def init():
        re = jnp.zeros(1 << n, dtype=fdtype).at[0].set(1.0)
        im = jnp.zeros(1 << n, dtype=fdtype)
        return (lax_with_sharding(re, sharding),
                lax_with_sharding(im, sharding))

    return init()


def put_state_planar(mesh: Mesh, planes, fdtype=jnp.float32):
    """Device-put host (2, 2^n) f32 planes (or a complex vector) as a
    sharded (re, im) pair — the runner's planar resume path."""
    from ..utils.transfer import upload_array

    arr = np.asarray(planes)
    if arr.ndim == 1:  # complex vector: split on host
        arr = np.stack([arr.real, arr.imag])
    arr = arr.astype(jnp.dtype(fdtype).name)
    sharding = state_sharding(mesh)
    return (upload_array(arr[0], sharding=sharding),
            upload_array(arr[1], sharding=sharding))
