"""QASM frontend + (optional) Qiskit dual-oracle tests."""
import math

import numpy as np
import pytest

from quantum_simulations_tpu.circuit import library as lib
from quantum_simulations_tpu.circuit.import_qasm import QasmError, qasm_to_dict
from quantum_simulations_tpu.oracle import dense_numpy as oracle

BELL = """
OPENQASM 2.0;
include "qelib1.inc";
qreg q[2];
creg c[2];
h q[0];
cx q[0], q[1];
measure q -> c;
"""


def test_bell_qasm():
    cd = qasm_to_dict(BELL)
    assert cd["number_of_qubits"] == 2
    assert [g["gate"] for g in cd["gates"]] == ["H", "CNOT"]
    np.testing.assert_allclose(
        oracle.simulate(cd), oracle.simulate(lib.bell()), atol=1e-12
    )


def test_params_and_pi_arithmetic():
    src = """
    OPENQASM 2.0;
    qreg q[2];
    rz(pi/2) q[0];
    u3(pi/2, 0, pi) q[1];
    cp(-pi/4) q[0], q[1];
    rzz(2*pi/8) q[0], q[1];
    """
    cd = qasm_to_dict(src)
    assert cd["gates"][0]["params"]["theta"] == pytest.approx(math.pi / 2)
    assert cd["gates"][1]["gate"] == "U"
    assert cd["gates"][2]["params"]["phi"] == pytest.approx(-math.pi / 4)
    psi = oracle.simulate(cd)
    assert abs(np.vdot(psi, psi).real - 1) < 1e-12


def test_register_broadcast():
    src = "OPENQASM 2.0; qreg q[4]; h q;"
    cd = qasm_to_dict(src)
    assert len(cd["gates"]) == 4
    np.testing.assert_allclose(
        oracle.simulate(cd), oracle.simulate(lib.hadamard_wall(4)), atol=1e-12
    )


def test_multiple_qregs_concatenate():
    src = "OPENQASM 2.0; qreg a[2]; qreg b[3]; x a[1]; x b[0];"
    cd = qasm_to_dict(src)
    assert cd["number_of_qubits"] == 5
    psi = oracle.simulate(cd)
    # a[1] = global qubit 1, b[0] = global qubit 2 -> index 0b110.
    assert abs(psi[6] - 1.0) < 1e-12


def test_custom_gate_definition():
    src = """
    OPENQASM 2.0;
    gate majority a,b,c { cx c,b; cx c,a; ccx a,b,c; }
    gate entangle(t) a,b { h a; cx a,b; rz(t) b; }
    qreg q[3];
    entangle(pi/4) q[0], q[1];
    majority q[0], q[1], q[2];
    """
    cd = qasm_to_dict(src)
    names = [g["gate"] for g in cd["gates"]]
    assert names == ["H", "CNOT", "RZ", "CNOT", "CNOT", "CCX"]
    psi = oracle.simulate(cd)
    assert abs(np.vdot(psi, psi).real - 1) < 1e-12


def test_nested_custom_gates():
    src = """
    OPENQASM 2.0;
    gate inner a { h a; t a; }
    gate outer a,b { inner a; cx a,b; }
    qreg q[2];
    outer q[0], q[1];
    """
    cd = qasm_to_dict(src)
    assert [g["gate"] for g in cd["gates"]] == ["H", "T", "CNOT"]


def test_comments_stripped():
    src = """
    // header comment
    OPENQASM 2.0;
    qreg q[1];
    /* block
       comment */
    h q[0]; // trailing
    """
    cd = qasm_to_dict(src)
    assert len(cd["gates"]) == 1


def test_unsupported_raises():
    with pytest.raises(QasmError):
        qasm_to_dict("OPENQASM 2.0; qreg q[1]; reset q[0];")
    with pytest.raises(QasmError):
        qasm_to_dict("OPENQASM 2.0; qreg q[1]; froboz q[0];")


def test_qft_qasm_vs_library():
    # QFT-4 written directly in QASM (matching our CR convention).
    src = """
    OPENQASM 2.0;
    qreg q[4];
    h q[3]; cp(pi/2) q[2],q[3]; cp(pi/4) q[1],q[3]; cp(pi/8) q[0],q[3];
    h q[2]; cp(pi/2) q[1],q[2]; cp(pi/4) q[0],q[2];
    h q[1]; cp(pi/2) q[0],q[1];
    h q[0];
    swap q[0],q[3]; swap q[1],q[2];
    """
    cd = qasm_to_dict(src)
    np.testing.assert_allclose(
        oracle.simulate(cd), oracle.simulate(lib.qft(4)), atol=1e-10
    )


# ---------------------------------------------------------------------------
# Qiskit dual oracle (skips when qiskit absent — not in this image)
# ---------------------------------------------------------------------------

def test_qiskit_overlap():
    pytest.importorskip("qiskit", reason="qiskit not installed")
    from quantum_simulations_tpu.circuit.import_qiskit import overlap_with_qiskit
    for cd in (lib.bell(), lib.qft(5), lib.random_circuit(5, 30, seed=1)):
        psi = oracle.simulate(cd)
        assert overlap_with_qiskit(cd, psi) > 1 - 1e-9


def test_broadcast_width_mismatch_raises():
    src = """
    OPENQASM 2.0; include "qelib1.inc";
    qreg a[2]; qreg b[3];
    cx a, b;
    """
    with pytest.raises(QasmError, match="register widths"):
        qasm_to_dict(src)


# ---------------------------------------------------------------------------
# QASM export round trip (export_qasm -> import_qasm -> same state)
# ---------------------------------------------------------------------------

class TestQasmExport:
    def _roundtrip(self, cd, atol=1e-9):
        from quantum_simulations_tpu.circuit.export_qasm import to_qasm
        from quantum_simulations_tpu.circuit.import_qasm import qasm_to_dict
        from quantum_simulations_tpu.oracle import dense_numpy as oracle

        back = qasm_to_dict(to_qasm(cd))
        assert back["number_of_qubits"] == cd["number_of_qubits"]
        a = oracle.simulate(cd)
        b = oracle.simulate(back)
        np.testing.assert_allclose(a, b, atol=atol)

    def test_library_families_roundtrip(self):
        from quantum_simulations_tpu.circuit import library as lib

        for cd in (lib.bell(), lib.ghz(4), lib.qft(5), lib.w_state(4),
                   lib.qpe(4), lib.random_circuit(5, 30, seed=2),
                   lib.qaoa_maxcut(5), lib.trotter_ising(5),
                   lib.grover(4), lib.su2_random(4)):
            self._roundtrip(cd)

    def test_every_gate_roundtrip(self):
        from quantum_simulations_tpu.circuit import gates as G

        rng = np.random.default_rng(5)
        gates = []
        for q, name in enumerate(["H", "X", "Y", "Z", "S", "T", "SDG",
                                  "TDG", "SX"]):
            gates.append({"qubits": [q % 4], "gate": name})
        for name in ["RX", "RY", "RZ", "P"]:
            gates.append({"qubits": [1], "gate": name,
                          "params": {("phi" if name == "P" else "theta"):
                                     float(rng.uniform(-3, 3))}})
        gates.append({"qubits": [2], "gate": "R", "params": {"k": 3}})
        gates.append({"qubits": [2], "gate": "G", "params": {"p": 4}})
        gates.append({"qubits": [0], "gate": "U",
                      "params": {"theta": 0.3, "phi": -1.2, "lam": 2.1}})
        gates.append({"qubits": [3], "gate": "U2",
                      "params": {"phi": 0.7, "lam": -0.4}})
        for name in ["CNOT", "SWAP", "CZ", "CY"]:
            gates.append({"qubits": [0, 1], "gate": name})
        gates.append({"qubits": [1, 2], "gate": "CR", "params": {"k": 2}})
        for name in ["CP", "CRX", "CRY", "CRZ", "RXX", "RYY", "RZZ"]:
            key = "phi" if name == "CP" else "theta"
            gates.append({"qubits": [2, 3], "gate": name,
                          "params": {key: float(rng.uniform(-3, 3))}})
        for name in ["CCX", "CCZ", "CSWAP"]:
            gates.append({"qubits": [0, 1, 2], "gate": name})
        cd = {"number_of_qubits": 4, "gates": gates}
        self._roundtrip(cd)

    @pytest.mark.parametrize("exponent", [0, 1, 2, 3, -1])
    def test_cu_decomposition(self, exponent):
        # CU has no QASM primitive; the exporter emits the exact ABC
        # decomposition (incl. global phase via p() on the control).
        rng = np.random.default_rng(7 + exponent)
        A = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
        Q, _ = np.linalg.qr(A)
        cd = {"number_of_qubits": 3, "gates": [
            {"qubits": [0], "gate": "H"},
            {"qubits": [2], "gate": "H"},
            {"qubits": [0, 2], "gate": "CU",
             "params": {"U": Q.tolist(), "exponent": exponent}},
        ]}
        self._roundtrip(cd)

    def test_cu_diagonal_and_offdiagonal_edge(self):
        for U in (np.diag([1.0, np.exp(0.9j)]),            # gamma == 0
                  np.array([[0, 1j], [1j, 0]]),            # gamma == pi
                  np.eye(2)):
            cd = {"number_of_qubits": 2, "gates": [
                {"qubits": [0], "gate": "H"},
                {"qubits": [1], "gate": "H"},
                {"qubits": [0, 1], "gate": "CU",
                 "params": {"U": np.asarray(U).tolist(), "exponent": 1}},
            ]}
            self._roundtrip(cd)

    def test_dot_export(self):
        from quantum_simulations_tpu.circuit import library as lib
        from quantum_simulations_tpu.circuit.dag import partition, to_dot

        cd = lib.ghz(4)
        dot = to_dot(cd)
        assert dot.startswith("digraph circuit {")
        assert dot.count("->") == 3  # H->CNOT->CNOT->CNOT chain
        parts = partition(cd, 2, "locality")
        clustered = to_dot(cd, parts)
        assert "subgraph cluster_0" in clustered
