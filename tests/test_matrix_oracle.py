"""Dual-oracle differential matrix + native measurement parity.

The native C++ engine is an independent implementation of the circuit
contract, so the cross-tier matrix provides the dual-oracle validation
the reference gets from Qiskit (``tests/test_qiskit_oracle.py:22-68``)
without needing qiskit in the image.
"""
import numpy as np
import pytest

from quantum_simulations_tpu.bench import matrix
from quantum_simulations_tpu.circuit import library as lib
from quantum_simulations_tpu.oracle import dense_numpy as oracle
from quantum_simulations_tpu.oracle import native as native_oracle

pytestmark = pytest.mark.skipif(
    not native_oracle.available(), reason="no C++ toolchain")


def test_cross_tier_matrix_agrees_to_1e10():
    out = matrix.run(sizes=(8, 11), dtype_name="complex128")
    assert out["tol"] == 1e-10
    bad = [r for r in out["rows"] if r["status"] not in ("ok",)
           and not str(r["status"]).startswith("skip")]
    assert not bad, bad
    # the matrix must actually exercise the independent oracle + the
    # sharded and out-of-core tiers, across >= 10 families
    assert {"native", "window", "sharded", "spill", "sparse"} <= set(
        out["tiers_seen"])
    fams = {r["family"] for r in out["rows"] if r["status"] == "ok"}
    assert len(fams) >= 10, fams


def test_native_prob_and_measure_parity():
    rng = np.random.default_rng(3)
    n = 10
    psi = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    psi = (psi / np.linalg.norm(psi)).astype(np.complex128)

    for q in (0, 3, n - 1):
        p1 = native_oracle.prob_qubit(psi.copy(), q)
        want = float(np.sum(np.abs(psi[(np.arange(1 << n) >> q) & 1 == 1]) ** 2))
        assert abs(p1 - want) < 1e-12

    # collapse: outcome matches, state renormalized, support correct
    buf = psi.copy()
    outcome, buf = native_oracle.measure_qubit(buf, 4, np.random.default_rng(0))
    assert outcome in (0, 1)
    idx_bit = (np.arange(1 << n) >> 4) & 1
    assert np.all(buf[idx_bit != outcome] == 0)
    assert abs(np.linalg.norm(buf) - 1.0) < 1e-12


def test_native_measure_all_ghz_correlated():
    cd = lib.ghz(12)
    psi = native_oracle.simulate(cd)
    for seed in range(5):
        buf = psi.copy()
        bits = native_oracle.measure_all(buf, 12, np.random.default_rng(seed))
        assert bits in ("0" * 12, "1" * 12)


def test_native_measure_statistics():
    """|+> measured many times: outcome frequency ~ 1/2."""
    cd = {"number_of_qubits": 6, "gates": [
        {"gate": "H", "qubits": [2], "params": {}}]}
    psi = native_oracle.simulate(cd)
    rng = np.random.default_rng(42)
    ones = sum(
        native_oracle.measure_qubit(psi.copy(), 2, rng)[0] for _ in range(200))
    assert 60 <= ones <= 140
