"""Transfer helper tests (normal CPU paths; the tunnel fallbacks are
exercised on hardware — see docs/performance.md ground rules)."""
import numpy as np
import jax.numpy as jnp

from quantum_simulations_tpu.utils.transfer import fetch_array, upload_array


def test_fetch_complex_roundtrip():
    x = jnp.asarray(np.arange(16, dtype=np.complex64) * (1 + 2j))
    out = fetch_array(x)
    assert out.dtype == np.complex64
    np.testing.assert_array_equal(out, np.asarray(x))


def test_fetch_real():
    x = jnp.ones(8, jnp.float32)
    np.testing.assert_array_equal(fetch_array(x), np.ones(8, np.float32))


def test_upload_roundtrip():
    host = np.arange(32, dtype=np.complex128)
    dev = upload_array(host)
    np.testing.assert_array_equal(fetch_array(dev), host)


def test_striped_fetch_exact():
    """_fetch_striped splits at stripe_bytes and reassembles exactly,
    including ragged tails and 2-D shapes."""
    from quantum_simulations_tpu.utils import transfer as T

    for shape, stripe in [((1000,), 64), ((1000,), 4096), ((7, 33), 100),
                          ((64,), 256), ((1,), 8)]:
        x = jnp.asarray(
            np.arange(int(np.prod(shape)), dtype=np.float32).reshape(shape))
        out = T._fetch_striped(x, stripe)
        assert out.shape == shape and out.dtype == np.float32
        np.testing.assert_array_equal(out, np.asarray(x))


def test_striped_fetch_complex_via_failed_direct(monkeypatch):
    """When direct device_get fails, complex arrays split into planes
    and each plane stripes — the tunnel ladder, forced on CPU."""
    import jax

    from quantum_simulations_tpu.utils import transfer as T

    real_get = jax.device_get
    calls = {"n": 0}

    def flaky_get(x):
        calls["n"] += 1
        if calls["n"] == 1:  # the initial whole-array direct attempt
            raise RuntimeError("UNIMPLEMENTED (simulated tunnel)")
        return real_get(x)

    monkeypatch.setattr(jax, "device_get", flaky_get)
    z = jnp.asarray((np.arange(300) + 1j * np.arange(300)[::-1])
                    .astype(np.complex64))
    out = T.fetch_array(z, stripe_bytes=256)
    monkeypatch.undo()
    assert out.dtype == np.complex64
    np.testing.assert_array_equal(out, np.asarray(z))
    assert calls["n"] > 2  # plane fetches happened stripe-wise


def test_direct_fetch_safe_gate(monkeypatch):
    """Complex direct fetch is skipped on the axon tunnel (a failed
    attempt poisons the session) but attempted elsewhere."""
    from quantum_simulations_tpu.utils import transfer as T

    z = jnp.zeros(4, jnp.complex64)
    f = jnp.zeros(4, jnp.float32)
    monkeypatch.setattr(T, "_is_axon", True)
    assert not T._direct_fetch_safe(z)
    assert T._direct_fetch_safe(f)
    monkeypatch.setenv("QST_FETCH_DIRECT", "1")
    assert T._direct_fetch_safe(z)
    monkeypatch.delenv("QST_FETCH_DIRECT")
    monkeypatch.setattr(T, "_is_axon", False)
    assert T._direct_fetch_safe(z)
