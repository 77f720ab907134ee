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
