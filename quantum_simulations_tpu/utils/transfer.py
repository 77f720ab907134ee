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


# The axon tunnel rejects single f32 fetches >= 64 MB (measured in
# bench/probe_transfer.py; 8-48 MB stripes run at the tunnel's full
# ~28 MB/s).  Large fetches fall back to striped slicing at this size.
STRIPE_BYTES = 32 << 20

_slicer_cache: dict = {}


def _fetch_striped(x, stripe_bytes: int) -> np.ndarray:
    """Fetch a large array as <= stripe_bytes host copies.

    One cached jitted program takes a *traced* offset and returns a
    single ``lax.dynamic_slice`` stripe, so at most one stripe (plus
    the source) is resident on device per iteration — the previous
    all-stripes-as-one-tuple formulation transiently doubled the
    device footprint, which can OOM at exactly the capacity-tier
    sizes this path exists for.  Cached per (shape, dtype, stripe).
    """
    dt = np.dtype(x.dtype)
    per = max(1, stripe_bytes // dt.itemsize)
    size = int(np.prod(x.shape)) if x.shape else 1
    nfull, tail = divmod(size, per)
    key = (tuple(x.shape), dt.str, per)
    fns = _slicer_cache.get(key)
    if fns is None:
        def slice_full(a, off):
            return jax.lax.dynamic_slice(jnp.ravel(a), (off,), (per,))

        def slice_tail(a):
            return jax.lax.dynamic_slice(
                jnp.ravel(a), (nfull * per,), (tail,))

        fns = (jax.jit(slice_full), jax.jit(slice_tail) if tail else None)
        _slicer_cache[key] = fns
    slice_full, slice_tail = fns
    out = np.empty(size, dt)
    for i in range(nfull):
        part = slice_full(x, i * per)
        out[i * per:(i + 1) * per] = np.asarray(jax.device_get(part))
        del part  # drop the device stripe before slicing the next one
    if tail:
        part = slice_tail(x)
        out[nfull * per:] = np.asarray(jax.device_get(part))
        del part
    return out.reshape(x.shape)


_is_axon: bool | None = None


def _on_axon_tunnel() -> bool | None:
    """The axon remote-TPU tunnel reports platform 'tpu'; it is only
    identifiable from the PJRT platform_version string.

    Reads the *public* PJRT surface (``device.client.platform_version``)
    rather than ``jax._src`` internals.  Returns ``None`` when the
    string cannot be read at all — callers gating complex transfers
    must then fail closed (a failed complex device_get on axon poisons
    the whole session, so "unknown" may not be treated as "safe").
    """
    global _is_axon
    if _is_axon is None:
        try:
            ver = str(jax.devices()[0].client.platform_version)
        except Exception:
            return None
        _is_axon = "axon" in ver
    return _is_axon


def _direct_fetch_safe(x) -> bool:
    """Whether attempting a plain device_get is SAFE (not just likely
    to succeed).

    On the axon tunnel a *failed* complex device_get poisons the whole
    session — every later program touching ANY complex array fails
    with UNIMPLEMENTED (measured; NOTES_ROUND3.md) — so the complex
    attempt must be skipped there, not try/except'd.  Failed float
    fetches are harmless and stay on the try-then-stripe ladder.
    Override with ``QST_FETCH_DIRECT=1`` on future backend revs.
    """
    import os

    if os.environ.get("QST_FETCH_DIRECT"):
        return True
    if jnp.dtype(x.dtype).kind == "c" and _on_axon_tunnel() is not False:
        # True -> axon, must skip.  None -> platform string unreadable:
        # fail closed, since a failed complex fetch on axon is
        # session-poisoning while the split-plane path is safe anywhere.
        return False
    return True


def fetch_array(x, *, stripe_bytes: int = STRIPE_BYTES) -> np.ndarray:
    """device_get that works for complex and large arrays on
    restricted backends.

    Fallback ladder: plain device_get (when safe to attempt) ->
    complex split into two float-plane fetches (each recursing here,
    so big planes stripe too) -> striped <= 32 MB slice fetches.  The
    splits/slices must run under jit: eager ops can be unsupported on
    the same backends that reject the transfers.
    """
    if _direct_fetch_safe(x):
        try:
            return np.asarray(jax.device_get(x))
        except Exception:
            if jnp.dtype(x.dtype).kind != "c":
                return _fetch_striped(x, stripe_bytes)
    re, im = _split_planes(x)
    return (
        fetch_array(re, stripe_bytes=stripe_bytes)
        + 1j * fetch_array(im, stripe_bytes=stripe_bytes)
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
