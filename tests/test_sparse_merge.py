"""Sparse partial-state merging tests (v3 state-merger parity)."""
import math

import numpy as np
import pytest

from quantum_simulations_tpu.circuit import library as lib
from quantum_simulations_tpu.oracle import dense_numpy as oracle
from quantum_simulations_tpu.sparse.engine import SparseState, simulate_sparse
from quantum_simulations_tpu.sparse.merge import merge_sparse_states


def test_merge_sums_amplitudes():
    a = SparseState(2, {0: 0.5, 1: 0.5})
    b = SparseState(2, {1: 0.25, 3: 0.25})
    m = merge_sparse_states([a, b])
    assert m.amplitude(0) == 0.5
    assert m.amplitude(1) == 0.75
    assert m.amplitude(3) == 0.25


def test_merge_linearity_vs_oracle():
    """Simulating a superposition == merging branch simulations."""
    cd_tail = lib.qft(4)["gates"]
    s = 1 / math.sqrt(2)
    # Branch 1: |0000>; branch 2: |0001> (X on q0 first).
    b1 = simulate_sparse({"number_of_qubits": 4, "gates": cd_tail})
    b2 = simulate_sparse({"number_of_qubits": 4,
                          "gates": [{"qubits": [0], "gate": "X"}] + cd_tail})
    scaled1 = SparseState(4, {i: s * a for i, a in b1.items()})
    scaled2 = SparseState(4, {i: s * a for i, a in b2.items()})
    merged = merge_sparse_states([scaled1, scaled2])

    full = {"number_of_qubits": 4,
            "gates": [{"qubits": [0], "gate": "H"}] + cd_tail}
    want = oracle.simulate(full)
    np.testing.assert_allclose(merged.to_dense(), want, atol=1e-10)


def test_merge_threshold_and_renormalize():
    a = SparseState(2, {0: 1.0, 1: 1e-20})
    m = merge_sparse_states([a], threshold=1e-12, renormalize=True)
    assert len(m) == 1 and abs(m.norm() - 1) < 1e-12


def test_merge_mismatch_raises():
    with pytest.raises(ValueError):
        merge_sparse_states([SparseState(2, {}), SparseState(3, {})])
    with pytest.raises(ValueError):
        merge_sparse_states([])
