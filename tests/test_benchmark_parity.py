"""Cross-size benchmark-parity sweep against CLOSED-FORM oracles.

The v1-tier parity test (reference
``v1_implementation/tests/test_benchmark_parity.py:26-37``) sweeps
GHZ 5-34, W 5-34, QFT 5-24 and QPE 5-18 against an independent legacy
implementation, size-capped by an env var.  Here the independent
reference is exact mathematics — the closed-form final state of each
family — so the sweep scales past what any dense oracle could check:

* GHZ / W at n up to 34 run through the sparse tier (nnz 2 / n);
* QFT on a random basis state has the analytic state
  ``exp(2*pi*i*x*k/N)/sqrt(N)`` — checked against the FUSED engine
  (complex128) across sizes;
* QPE with eigenphase j/2^m peaks at index ``j + 2^m`` with
  probability 1 — exact, any m.

``QST_PARITY_MAX_QUBITS`` (default 14 dense / 34 sparse) caps the
sweep like the reference's ``BENCHMARK_PARITY_MAX_QUBITS``.
"""
import os

import numpy as np
import pytest

from quantum_simulations_tpu.circuit import library as lib
from quantum_simulations_tpu.runtime.simulator import simulate_np
from quantum_simulations_tpu.sparse.engine import simulate_sparse

DENSE_CAP = int(os.environ.get("QST_PARITY_MAX_QUBITS", "14"))
SPARSE_CAP = int(os.environ.get("QST_PARITY_MAX_QUBITS", "34"))


def _sizes(lo, hi, cap):
    return [n for n in range(lo, hi + 1, 3) if n <= cap] or [lo]


@pytest.mark.parametrize("n", _sizes(5, 34, SPARSE_CAP))
def test_ghz_sweep_sparse_closed_form(n):
    st = simulate_sparse(lib.ghz(n))
    amps = {int(i): complex(a) for i, a in st.items()}
    assert set(amps) == {0, (1 << n) - 1}
    for v in amps.values():
        assert abs(v - 1 / np.sqrt(2)) < 1e-10


@pytest.mark.parametrize("n", _sizes(5, 34, SPARSE_CAP))
def test_w_sweep_sparse_closed_form(n):
    st = simulate_sparse(lib.w_state(n))
    amps = {int(i): complex(a) for i, a in st.items()}
    assert set(amps) == {1 << i for i in range(n)}
    for v in amps.values():
        assert abs(v - 1 / np.sqrt(n)) < 1e-9


@pytest.mark.parametrize("n", _sizes(5, 24, DENSE_CAP))
def test_qft_sweep_vs_analytic(n):
    rng = np.random.default_rng(n)
    x = int(rng.integers(0, 1 << n))
    cd = lib.qft(n)
    prep = [{"qubits": [q], "gate": "X"} for q in range(n) if (x >> q) & 1]
    cd = {"number_of_qubits": n, "gates": prep + cd["gates"]}
    psi = simulate_np(cd, dtype="complex128")
    k = np.arange(1 << n)
    analytic = np.exp(2j * np.pi * x * k / (1 << n)) / np.sqrt(1 << n)
    np.testing.assert_allclose(psi, analytic, atol=1e-10)


@pytest.mark.parametrize("m", _sizes(5, 18, DENSE_CAP - 1))
def test_qpe_sweep_exact_peak(m):
    rng = np.random.default_rng(m)
    j = int(rng.integers(1, 1 << m))
    psi = simulate_np(lib.qpe(m, theta=j / (1 << m)), dtype="complex128")
    probs = np.abs(psi) ** 2
    peak = int(np.argmax(probs))
    assert peak == j + (1 << m)
    assert probs[peak] > 1 - 1e-10  # exact eigenphase: certainty
