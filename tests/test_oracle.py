"""Oracle tests: endianness lock, known states, gate algebra.

Mirrors the reference's convention-lock and known-state pyramid
(wenbo_engine/tests/test_endianness_lock.py, test_ref_known_states.py).
"""
import math

import numpy as np
import pytest

from quantum_simulations_tpu.circuit import gates as G
from quantum_simulations_tpu.circuit import library as lib
from quantum_simulations_tpu.oracle import dense_numpy as oracle


# ---------------------------------------------------------------------------
# Endianness lock — NEVER change these assertions.
# ---------------------------------------------------------------------------

def test_endianness_is_little():
    from quantum_simulations_tpu.circuit.contract import ENDIANNESS
    assert ENDIANNESS == "little"


def test_x_on_q0_of_3_qubits():
    """X on qubit 0 of |000> puts all amplitude at index 1 (qubit0 = LSB)."""
    psi = oracle.simulate({"number_of_qubits": 3,
                           "gates": [{"qubits": [0], "gate": "X"}]})
    expected = np.zeros(8, dtype=complex)
    expected[1] = 1.0
    np.testing.assert_allclose(psi, expected, atol=1e-12)


def test_x_on_q2_of_3_qubits():
    psi = oracle.simulate({"number_of_qubits": 3,
                           "gates": [{"qubits": [2], "gate": "X"}]})
    assert abs(psi[4] - 1.0) < 1e-12


def test_cnot_big_endian_subspace():
    """CNOT: control = qubits[0].  |q0=1> controls X on q1 → index 3."""
    psi = oracle.simulate({"number_of_qubits": 2, "gates": [
        {"qubits": [0], "gate": "X"},          # |01> little-endian = idx 1
        {"qubits": [0, 1], "gate": "CNOT"},    # control q0=1 → flip q1
    ]})
    assert abs(psi[3] - 1.0) < 1e-12


# ---------------------------------------------------------------------------
# Known states
# ---------------------------------------------------------------------------

def test_bell():
    psi = oracle.simulate(lib.bell())
    s = 1 / math.sqrt(2)
    np.testing.assert_allclose(psi, [s, 0, 0, s], atol=1e-12)


def test_ghz3():
    psi = oracle.simulate(lib.ghz(3))
    s = 1 / math.sqrt(2)
    expected = np.zeros(8, dtype=complex)
    expected[0] = expected[7] = s
    np.testing.assert_allclose(psi, expected, atol=1e-12)


def test_hwall_uniform():
    psi = oracle.simulate(lib.hadamard_wall(4))
    np.testing.assert_allclose(psi, np.full(16, 0.25), atol=1e-12)


def test_qft_of_zero_is_uniform():
    psi = oracle.simulate(lib.qft(5))
    np.testing.assert_allclose(psi, np.full(32, 1 / math.sqrt(32)), atol=1e-12)


def test_qft_matches_dft_matrix():
    """QFT circuit == DFT matrix (little-endian) applied to a basis state."""
    n = 4
    N = 1 << n
    prep = {"number_of_qubits": n, "gates": [{"qubits": [0], "gate": "X"},
                                             {"qubits": [2], "gate": "X"}]}
    x_idx = 0b0101  # q0=1, q2=1
    cd = dict(prep)
    cd = {"number_of_qubits": n, "gates": prep["gates"] + lib.qft(n)["gates"]}
    psi = oracle.simulate(cd)
    omega = np.exp(2j * np.pi / N)
    expected = np.array([omega ** (x_idx * y) for y in range(N)]) / math.sqrt(N)
    np.testing.assert_allclose(psi, expected, atol=1e-10)


def test_w_state():
    for n in (2, 3, 5, 8):
        psi = oracle.simulate(lib.w_state(n))
        expected = np.zeros(1 << n, dtype=complex)
        for q in range(n):
            expected[1 << q] = 1 / math.sqrt(n)
        np.testing.assert_allclose(psi, expected, atol=1e-10)


def test_qpe_recovers_eigenphase():
    """theta = 1/8 with 3+ counting qubits is read out exactly."""
    nc = 4
    psi = oracle.simulate(lib.qpe(nc, theta=1.0 / 8.0))
    probs = oracle.probabilities(psi)
    # Counting register is qubits 0..nc-1; eigenstate qubit nc is |1>.
    # theta = 1/8 = 0.001b → counting value 2^nc/8 = 2.
    want = (1 << nc) | 2
    assert probs[want] > 0.99


def test_random_circuit_norm_preserved():
    psi = oracle.simulate(lib.random_circuit(6, 60, seed=5))
    assert abs(np.vdot(psi, psi).real - 1.0) < 1e-10


def test_qaoa_norm_preserved():
    psi = oracle.simulate(lib.qaoa_maxcut(6, p=2))
    assert abs(np.vdot(psi, psi).real - 1.0) < 1e-10


def test_sycamore_like_norm_and_spread():
    psi = oracle.simulate(lib.sycamore_like(6, depth=6))
    assert abs(np.vdot(psi, psi).real - 1.0) < 1e-10
    # Dense random circuit: many nonzero amplitudes.
    assert np.count_nonzero(np.abs(psi) > 1e-8) > 32


# ---------------------------------------------------------------------------
# Gate algebra
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", sorted(G.FIXED_1Q) + sorted(G.EXT_FIXED_1Q))
def test_1q_unitarity(name):
    U = G.gate_matrix(name, {})
    np.testing.assert_allclose(U @ U.conj().T, np.eye(2), atol=1e-12)


@pytest.mark.parametrize("name", sorted(G.FIXED_2Q))
def test_2q_unitarity(name):
    U = G.gate_matrix(name, {})
    np.testing.assert_allclose(U @ U.conj().T, np.eye(4), atol=1e-12)


def test_param_gate_values():
    np.testing.assert_allclose(G.gate_matrix("R", {"k": 1}), np.diag([1, -1]),
                               atol=1e-12)
    np.testing.assert_allclose(G.gate_matrix("R", {"k": 2}), np.diag([1, 1j]),
                               atol=1e-12)
    np.testing.assert_allclose(G.gate_matrix("RY", {"theta": np.pi}),
                               [[0, -1], [1, 0]], atol=1e-12)
    cr3 = G.gate_matrix("CR", {"k": 3})
    assert abs(cr3[3, 3] - np.exp(2j * np.pi / 8)) < 1e-12


def test_cu_exponent():
    U = [[0, 1], [1, 0]]  # X
    m = G.gate_matrix("CU", {"U": U, "exponent": 2})
    np.testing.assert_allclose(m, np.eye(4), atol=1e-12)  # X^2 = I
    m = G.gate_matrix("CU", {"U": U, "exponent": 3})
    np.testing.assert_allclose(m, G.CNOT(), atol=1e-12)


def test_rzz_diagonal_structure():
    U = G.gate_matrix("RZZ", {"theta": 0.7})
    assert G.is_diagonal(U)
    assert not G.is_diagonal(G.gate_matrix("CNOT", {}))
    assert G.is_diagonal(G.gate_matrix("CZ", {}))
    assert G.is_diagonal(G.gate_matrix("CR", {"k": 2}))


def test_block_structure_detection():
    cnot = G.gate_matrix("CNOT", {})
    # CNOT never flips the control (gate bit 1 = qubits[0]).
    assert G.block_diagonal_in(cnot, sub_bit=1)
    assert not G.block_diagonal_in(cnot, sub_bit=0)
    np.testing.assert_allclose(G.sub_block(cnot, 1, 0), np.eye(2), atol=1e-15)
    np.testing.assert_allclose(G.sub_block(cnot, 1, 1), G.X(), atol=1e-15)
    swap = G.gate_matrix("SWAP", {})
    assert not G.block_diagonal_in(swap, 0)
    assert not G.block_diagonal_in(swap, 1)


def test_3q_gates():
    psi = oracle.simulate({"number_of_qubits": 3, "gates": [
        {"qubits": [0], "gate": "X"},
        {"qubits": [1], "gate": "X"},
        {"qubits": [0, 1, 2], "gate": "CCX"},
    ]})
    assert abs(psi[7] - 1.0) < 1e-12  # both controls set → target flipped


def test_oracle_multi_qubit_consistency():
    """CCX == controlled-controlled decomposition sanity via matrices."""
    U = G.gate_matrix("CCX", {})
    np.testing.assert_allclose(U @ U, np.eye(8), atol=1e-12)


def _rand_unitary(m, rng):
    d = 1 << m
    a = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
    return np.linalg.qr(a)[0]


def test_apply_gate_lean_matches_apply_gate():
    """Blocked in-place path == gather path for random 1-3q gates,
    including top/bottom-qubit placements and tiny block sizes (the
    n=29-31 corpus differential runs on this path)."""
    rng = np.random.default_rng(42)
    n = 9
    cases = [list(rng.choice(n, size=m, replace=False))
             for m in (1, 1, 2, 2, 3, 3) for _ in range(4)]
    cases += [[0, n - 1], [n - 1], [0, 4, n - 1], [n - 1, 0],
              [n - 1, n - 2, n - 3], [0, 1, 2]]
    for qubits in cases:
        U = _rand_unitary(len(qubits), rng)
        psi = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
        want = oracle.apply_gate(psi, list(qubits), U)
        got = psi.copy()
        oracle.apply_gate_lean(got, list(qubits), U, block_amps=32)
        assert np.max(np.abs(got - want)) < 1e-12, qubits


def test_simulate_lean_end_to_end():
    for cd in (lib.qft(8), lib.grover(7)):
        a = oracle.simulate(cd)
        b = oracle.simulate_lean(cd)
        assert np.max(np.abs(a - b)) < 1e-12


def test_apply_gate_lean_rejects_high_arity():
    psi = np.zeros(16, np.complex128)
    psi[0] = 1.0
    with pytest.raises(ValueError):
        oracle.apply_gate_lean(psi, [0, 1, 2, 3], np.eye(16))
