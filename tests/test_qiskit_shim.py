"""Qiskit-importer logic coverage via a duck-typed shim.

qiskit is not installed in this image, so the real dual-oracle test
(``test_importers.test_qiskit_overlap``) skips.  This file installs a
minimal fake ``qiskit`` package into ``sys.modules`` and reloads
``circuit.import_qiskit`` against it, so the importer's mapping logic
(gate-name tables, param extraction, barrier/measure skipping, qubit
indexing, the CU matrix-power path) runs deterministically in CI.

Honest scope note: the shim's ``Statevector.from_instruction`` replays
the fake circuit through OUR oracle, so these tests pin the importer's
translation logic — they are NOT an external cross-check of gate
matrices (that remains the real-qiskit overlap test, which runs where
qiskit is available; matrices are pinned against closed forms in
``test_oracle.py``).

Reference role: ``wenbo_engine/circuit/import_qiskit.py`` +
``wenbo_engine/tests/test_qiskit_oracle.py``.
"""
from __future__ import annotations

import importlib
import math
import sys
import types

import numpy as np
import pytest

import quantum_simulations_tpu.circuit.import_qiskit as iq_mod
from quantum_simulations_tpu.circuit import library as lib
from quantum_simulations_tpu.oracle import dense_numpy as oracle

# ---------------------------------------------------------------------------
# The shim
# ---------------------------------------------------------------------------


class _Qubit:
    """Opaque hashable qubit identity (what ``qc.qubits`` holds)."""


class _Op:
    def __init__(self, name, params=()):
        self.name = name
        self.params = list(params)


class _Inst:
    def __init__(self, op, qubits):
        self.operation = op
        self.qubits = qubits


_NO_PARAM = [
    "h", "x", "y", "z", "s", "t", "sdg", "tdg", "sx",
    "cx", "cy", "cz", "swap", "ccx", "ccz", "cswap",
]
_ONE_PARAM = [
    "rx", "ry", "rz", "p", "cp", "crx", "cry", "crz",
    "rxx", "ryy", "rzz", "u1", "cu1",
]


class FakeQuantumCircuit:
    def __init__(self, n):
        self.num_qubits = n
        self.qubits = [_Qubit() for _ in range(n)]
        self.data = []

    def _add(self, name, params, qubits):
        self.data.append(
            _Inst(_Op(name, params), [self.qubits[q] for q in qubits])
        )

    def append(self, op, qubits):
        self.data.append(_Inst(op, [self.qubits[q] for q in qubits]))

    def barrier(self, *qubits):
        self._add("barrier", (), qubits)

    def measure(self, *args):
        self._add("measure", (), ())

    def u(self, theta, phi, lam, q):
        self._add("u", (theta, phi, lam), (q,))


def _mk_no_param(name):
    def m(self, *qubits):
        self._add(name, (), qubits)
    return m


def _mk_one_param(name):
    def m(self, angle, *qubits):
        self._add(name, (angle,), qubits)
    return m


for _n in _NO_PARAM:
    setattr(FakeQuantumCircuit, _n, _mk_no_param(_n))
for _n in _ONE_PARAM:
    setattr(FakeQuantumCircuit, _n, _mk_one_param(_n))


class FakeUnitaryGate:
    def __init__(self, matrix):
        self.matrix = np.asarray(matrix, dtype=complex)

    def control(self, num_ctrl):
        op = _Op("c-unitary", [])
        op.matrix = self.matrix
        op.num_ctrl = num_ctrl
        return op


class FakeStatevector:
    def __init__(self, data):
        self.data = np.asarray(data)

    @classmethod
    def from_instruction(cls, qc):
        # Replay through our importer + oracle (see module docstring).
        from quantum_simulations_tpu.circuit.import_qiskit import (
            qiskit_to_dict,
        )
        return cls(oracle.simulate(qiskit_to_dict(qc)))


def _build_shim_modules():
    qiskit = types.ModuleType("qiskit")
    qiskit.QuantumCircuit = FakeQuantumCircuit
    quantum_info = types.ModuleType("qiskit.quantum_info")
    quantum_info.Statevector = FakeStatevector
    circuit = types.ModuleType("qiskit.circuit")
    circuit_library = types.ModuleType("qiskit.circuit.library")
    circuit_library.UnitaryGate = FakeUnitaryGate
    qiskit.quantum_info = quantum_info
    qiskit.circuit = circuit
    circuit.library = circuit_library
    return {
        "qiskit": qiskit,
        "qiskit.quantum_info": quantum_info,
        "qiskit.circuit": circuit,
        "qiskit.circuit.library": circuit_library,
    }


@pytest.fixture()
def iq():
    """import_qiskit reloaded with the shim visible; restored after."""
    mods = _build_shim_modules()
    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    importlib.reload(iq_mod)
    assert iq_mod.HAVE_QISKIT
    try:
        yield iq_mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        importlib.reload(iq_mod)
        assert not iq_mod.HAVE_QISKIT


# ---------------------------------------------------------------------------
# qiskit -> dict direction
# ---------------------------------------------------------------------------


def test_every_direct_and_angled_name_maps(iq):
    arity_of = {
        "cx": 2, "cy": 2, "cz": 2, "swap": 2,
        "ccx": 3, "ccz": 3, "cswap": 3,
        "cp": 2, "cu1": 2, "crx": 2, "cry": 2, "crz": 2,
        "rxx": 2, "ryy": 2, "rzz": 2,
    }
    qc = FakeQuantumCircuit(3)
    expect = []
    for qname, gname in sorted(iq._DIRECT.items()):
        arity = arity_of.get(qname, 1)
        qc._add(qname, (), tuple(range(arity)))
        expect.append((gname, list(range(arity)), None))
    for qname, (gname, pname) in sorted(iq._ANGLED.items()):
        arity = arity_of.get(qname, 1)
        ang = 0.3
        qc._add(qname, (ang,), tuple(range(arity)))
        expect.append((gname, list(range(arity)), {pname: ang}))
    qc._add("u3", (0.1, 0.2, 0.3), (0,))
    expect.append(("U", [0], {"theta": 0.1, "phi": 0.2, "lam": 0.3}))
    qc._add("u", (0.1, 0.2, 0.3), (1,))
    expect.append(("U", [1], {"theta": 0.1, "phi": 0.2, "lam": 0.3}))
    qc._add("u2", (0.2, 0.3), (2,))
    expect.append(("U2", [2], {"phi": 0.2, "lam": 0.3}))
    # skipped ops contribute nothing
    qc.barrier(0, 1, 2)
    qc.measure()
    qc._add("delay", (), (0,))
    qc._add("id", (), (0,))

    cd = iq.qiskit_to_dict(qc)
    assert cd["number_of_qubits"] == 3
    assert len(cd["gates"]) == len(expect)
    for g, (gname, qubits, params) in zip(cd["gates"], expect):
        assert g["gate"] == gname
        assert g["qubits"] == qubits
        if params is None:
            assert "params" not in g
        else:
            assert g["params"] == pytest.approx(params)
    # every translated gate is a valid circuit: the oracle accepts it
    psi = oracle.simulate(cd)
    assert abs(np.vdot(psi, psi).real - 1) < 1e-9


def test_qubit_identity_indexing_not_positional(iq):
    """Gate qubits resolve via qubit object identity, reversed order kept."""
    qc = FakeQuantumCircuit(4)
    qc.cx(3, 1)
    qc.h(2)
    cd = iq.qiskit_to_dict(qc)
    assert cd["gates"][0] == {"qubits": [3, 1], "gate": "CNOT"}
    assert cd["gates"][1] == {"qubits": [2], "gate": "H"}


def test_unsupported_op_raises(iq):
    qc = FakeQuantumCircuit(2)
    qc._add("rccx", (), (0, 1))
    with pytest.raises(ValueError, match="unsupported qiskit op"):
        iq.qiskit_to_dict(qc)


# ---------------------------------------------------------------------------
# dict -> qiskit -> dict round trip
# ---------------------------------------------------------------------------

_ROUNDTRIP_FAMILIES = [
    lambda: lib.bell(),
    lambda: lib.ghz(5),
    lambda: lib.qft(5),
    lambda: lib.w_state(4),
    lambda: lib.random_circuit(5, 30, seed=7),
    lambda: lib.qaoa_maxcut(5),
    lambda: lib.trotter_ising(5),
    lambda: lib.grover(4),
    lambda: lib.su2_random(4),
]


def test_roundtrip_families_state_identical(iq):
    for mk in _ROUNDTRIP_FAMILIES:
        cd = mk()
        if any(g["gate"] == "CU" for g in cd["gates"]):
            continue  # CU emits a c-unitary op qiskit_to_dict cannot re-read
        back = iq.qiskit_to_dict(iq.dict_to_qiskit(cd))
        assert back["number_of_qubits"] == cd["number_of_qubits"]
        a = oracle.simulate(cd)
        b = oracle.simulate(back)
        np.testing.assert_allclose(a, b, atol=1e-9)


def test_name_encoded_r_cr_to_phase(iq):
    """R(k)/CR(k) export as p/cp with angle 2*pi/2^k (reference encoding)."""
    cd = {
        "number_of_qubits": 2,
        "gates": [
            {"qubits": [0], "gate": "R", "params": {"k": 3}},
            {"qubits": [0, 1], "gate": "CR", "params": {"k": 2}},
        ],
    }
    qc = iq.dict_to_qiskit(cd)
    assert qc.data[0].operation.name == "p"
    assert qc.data[0].operation.params[0] == pytest.approx(math.pi / 4)
    assert qc.data[1].operation.name == "cp"
    assert qc.data[1].operation.params[0] == pytest.approx(math.pi / 2)
    back = iq.qiskit_to_dict(qc)
    np.testing.assert_allclose(
        oracle.simulate(back), oracle.simulate(cd), atol=1e-12
    )


def test_cu_exports_matrix_power(iq):
    """CU(U, exponent) exports as a controlled unitary of U^exponent."""
    U = [[0, 1], [1, 0]]  # X
    cd = {
        "number_of_qubits": 2,
        "gates": [
            {"qubits": [0, 1], "gate": "CU",
             "params": {"U": U, "exponent": 3}},
        ],
    }
    qc = iq.dict_to_qiskit(cd)
    op = qc.data[0].operation
    assert op.name == "c-unitary" and op.num_ctrl == 1
    np.testing.assert_allclose(
        op.matrix, np.linalg.matrix_power(np.asarray(U, complex), 3),
        atol=1e-12,
    )


# ---------------------------------------------------------------------------
# overlap glue
# ---------------------------------------------------------------------------


def test_overlap_glue_is_one_for_own_state(iq):
    for cd in (lib.bell(), lib.qft(5), lib.random_circuit(5, 30, seed=1)):
        psi = oracle.simulate(cd)
        assert iq.overlap_with_qiskit(cd, psi) > 1 - 1e-9


def test_import_errors_without_qiskit():
    """Outside the shim fixture HAVE_QISKIT is False and calls raise."""
    if iq_mod.HAVE_QISKIT:  # pragma: no cover - real qiskit present
        pytest.skip("real qiskit installed")
    with pytest.raises(ImportError):
        iq_mod.qiskit_to_dict(FakeQuantumCircuit(1))
