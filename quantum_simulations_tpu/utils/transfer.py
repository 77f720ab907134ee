"""Device <-> host transfer helpers.

The axon TPU tunnel cannot ``device_get`` complex arrays (the
conversion path is UNIMPLEMENTED) and cannot ``device_put`` raw host
arrays at all.  These helpers route around both: complex fetches split
into two float-plane fetches on device; uploads go through a jitted
identity whose constant is baked into the executable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _split_planes(x):
    return jnp.real(x), jnp.imag(x)


def fetch_array(x) -> np.ndarray:
    """device_get that works for complex arrays on restricted backends.

    The split must run under jit: eager ops can be unsupported on the
    same backends that reject complex transfers.
    """
    try:
        return np.asarray(jax.device_get(x))
    except Exception:
        if jnp.dtype(x.dtype).kind != "c":
            raise
        re, im = _split_planes(x)
        return (
            np.asarray(jax.device_get(re)) + 1j * np.asarray(jax.device_get(im))
        ).astype(np.dtype(x.dtype))


def upload_array(host: np.ndarray, *, sharding=None):
    """device_put that works on backends without raw host->device DMA.

    The host array is embedded as a compile-time constant of a jitted
    identity program.  Intended for setup-path uploads (initial states,
    resume buffers) — not for hot loops.
    """
    host = np.asarray(host)
    try:
        if sharding is not None:
            return jax.device_put(host, sharding)
        return jax.device_put(host)
    except Exception:
        fn = jax.jit(
            lambda: jnp.asarray(host),
            out_shardings=sharding if sharding is not None else None,
        )
        return fn()
