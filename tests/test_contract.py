"""Contract/validation tests (parity with wenbo_engine/tests/test_contract.py)."""
import pytest

from quantum_simulations_tpu.circuit.contract import (
    levelize,
    parse_name_encoded,
    validate_circuit_dict,
)


def _ok(n=2, gates=None):
    return {"number_of_qubits": n, "gates": gates or []}


def test_valid_minimal():
    cd = validate_circuit_dict(_ok())
    assert cd["number_of_qubits"] == 2
    assert cd["gates"] == []


def test_not_a_dict():
    with pytest.raises(ValueError):
        validate_circuit_dict([1, 2])


def test_missing_keys():
    with pytest.raises(ValueError, match="missing"):
        validate_circuit_dict({"gates": []})
    with pytest.raises(ValueError, match="missing"):
        validate_circuit_dict({"number_of_qubits": 3})


def test_extra_top_level_key():
    d = _ok()
    d["bogus"] = 1
    with pytest.raises(ValueError, match="unknown top-level"):
        validate_circuit_dict(d)


def test_bad_qubit_count():
    with pytest.raises(ValueError):
        validate_circuit_dict({"number_of_qubits": 0, "gates": []})
    with pytest.raises(ValueError):
        validate_circuit_dict({"number_of_qubits": "3", "gates": []})
    with pytest.raises(ValueError):
        validate_circuit_dict({"number_of_qubits": -1, "gates": []})


def test_gates_not_list():
    with pytest.raises(ValueError):
        validate_circuit_dict({"number_of_qubits": 2, "gates": "H"})


def test_unsupported_gate():
    d = _ok(gates=[{"qubits": [0], "gate": "FOO"}])
    with pytest.raises(ValueError, match="unsupported gate"):
        validate_circuit_dict(d)


def test_wrong_arity():
    d = _ok(gates=[{"qubits": [0, 1], "gate": "H"}])
    with pytest.raises(ValueError, match="needs 1 qubit"):
        validate_circuit_dict(d)
    d = _ok(gates=[{"qubits": [0], "gate": "CNOT"}])
    with pytest.raises(ValueError, match="needs 2 qubit"):
        validate_circuit_dict(d)


def test_qubit_out_of_range():
    d = _ok(n=2, gates=[{"qubits": [2], "gate": "H"}])
    with pytest.raises(ValueError, match="out of range"):
        validate_circuit_dict(d)
    d = _ok(n=2, gates=[{"qubits": [-1], "gate": "H"}])
    with pytest.raises(ValueError, match="out of range"):
        validate_circuit_dict(d)


def test_duplicate_qubits_rejected():
    d = _ok(gates=[{"qubits": [0, 0], "gate": "CNOT"}])
    with pytest.raises(ValueError, match="duplicate"):
        validate_circuit_dict(d)


def test_extra_gate_key_rejected():
    d = _ok(gates=[{"qubits": [0], "gate": "H", "oops": 1}])
    with pytest.raises(ValueError, match="unknown keys"):
        validate_circuit_dict(d)


def test_missing_required_param():
    d = _ok(gates=[{"qubits": [0], "gate": "RY"}])
    with pytest.raises(ValueError, match="requires param"):
        validate_circuit_dict(d)


def test_name_encoded_cr():
    assert parse_name_encoded("CR3") == ("CR", {"k": 3})
    assert parse_name_encoded("R3") == ("R", {"k": 3})
    assert parse_name_encoded("RY") == ("RY", {})
    assert parse_name_encoded("H") == ("H", {})

    d = _ok(gates=[{"qubits": [0, 1], "gate": "CR3"}])
    cd = validate_circuit_dict(d)
    assert cd["gates"][0]["gate"] == "CR"
    assert cd["gates"][0]["params"]["k"] == 3


def test_explicit_params_override_name_encoding():
    d = _ok(gates=[{"qubits": [0, 1], "gate": "CR3", "params": {"k": 5}}])
    cd = validate_circuit_dict(d)
    assert cd["gates"][0]["params"]["k"] == 5


def test_core_only_rejects_extended():
    d = _ok(gates=[{"qubits": [0], "gate": "RX", "params": {"theta": 0.5}}])
    validate_circuit_dict(d)  # extended set: OK by default
    with pytest.raises(ValueError, match="unsupported gate"):
        validate_circuit_dict(d, core_only=True)


def test_levelize_dependencies():
    d = _ok(n=3, gates=[
        {"qubits": [0], "gate": "H"},
        {"qubits": [1], "gate": "H"},
        {"qubits": [0, 1], "gate": "CNOT"},
        {"qubits": [2], "gate": "X"},
    ])
    cd = validate_circuit_dict(d)
    levels = levelize(cd)
    assert len(levels) == 2
    assert [g["gate"] for g in levels[0]] == ["H", "H", "X"]
    assert [g["gate"] for g in levels[1]] == ["CNOT"]


def test_levelize_chain_depth():
    n = 5
    gates = [{"qubits": [i, i + 1], "gate": "CNOT"} for i in range(n - 1)]
    levels = levelize(validate_circuit_dict(_ok(n=n, gates=gates)))
    assert len(levels) == n - 1
