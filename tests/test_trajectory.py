"""Trajectory tier: RESET / mid-circuit MEASURE / conditional gates.

The reference's QASM driver *drops* ``reset`` with a printed warning
(``hisvsim_repo/qasm_assembler_standalone.py:525``) and cannot parse
``if(...)`` at all; this tier runs both with exact seeded-trajectory
semantics.  Validation here is dual:

* **oracle twin** — the jax runtime and the numpy-c128 oracle consume
  identical uniform draws, so outcomes/cregs/final state must agree
  at 1e-12 for every seed;
* **outcome-independent invariants** — teleportation reproduces the
  input state for *every* measurement branch, so a correctness bug in
  collapse/conditioning shows up without trusting the twin.
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from quantum_simulations_tpu import api
from quantum_simulations_tpu.circuit.contract import (
    has_nonunitary, validate_circuit_dict)
from quantum_simulations_tpu.circuit.import_qasm import (
    QasmError, qasm_to_dict)
from quantum_simulations_tpu.oracle import dense_numpy as oracle
from quantum_simulations_tpu.runtime.trajectory import (
    simulate_trajectory, split_segments)
from quantum_simulations_tpu.utils.config import SimulatorConfig

# ---------------------------------------------------------------------------
# contract


def _meas(q, creg="c", cbit=0, **kw):
    return {"qubits": [q], "gate": "MEASURE",
            "params": {"creg": creg, "cbit": cbit}, **kw}


def test_has_nonunitary():
    base = {"number_of_qubits": 2, "gates": [{"qubits": [0], "gate": "H"}]}
    assert not has_nonunitary(base)
    assert has_nonunitary({**base, "gates": [{"qubits": [0], "gate": "RESET"}]})
    assert has_nonunitary({**base, "gates": [_meas(0)]})
    assert has_nonunitary({**base, "gates": [
        {"qubits": [0], "gate": "X", "cond": {"creg": "c", "value": 1}}]})


def test_contract_accepts_nonunitary():
    cd = validate_circuit_dict({
        "number_of_qubits": 2,
        "gates": [
            {"qubits": [0], "gate": "H"},
            _meas(0, cbit=1),
            {"qubits": [1], "gate": "X", "cond": {"creg": "c", "value": 2}},
            {"qubits": [0], "gate": "RESET"},
        ],
    }, allow_nonunitary=True)
    assert cd["gates"][1]["params"] == {"creg": "c", "cbit": 1}
    assert cd["gates"][2]["cond"] == {"creg": "c", "value": 2}


@pytest.mark.parametrize("bad", [
    # default mode rejects trajectory instructions
    dict(gates=[{"qubits": [0], "gate": "RESET"}], allow=False),
    dict(gates=[_meas(0)], allow=False),
    dict(gates=[{"qubits": [0], "gate": "H",
                 "cond": {"creg": "c", "value": 1}}], allow=False),
    # malformed trajectory instructions
    dict(gates=[{"qubits": [0, 1], "gate": "RESET"}], allow=True),
    dict(gates=[{"qubits": [0], "gate": "MEASURE", "params": {}}], allow=True),
    dict(gates=[{"qubits": [0], "gate": "MEASURE",
                 "params": {"creg": "c", "cbit": -1}}], allow=True),
    dict(gates=[{"qubits": [0], "gate": "RESET",
                 "cond": {"creg": "c", "value": 1}}], allow=True),
    dict(gates=[{"qubits": [0], "gate": "H", "cond": {"creg": "c"}}],
         allow=True),
    dict(gates=[{"qubits": [0], "gate": "H",
                 "cond": {"creg": "c", "value": -2}}], allow=True),
])
def test_contract_rejects(bad):
    d = {"number_of_qubits": 2, "gates": bad["gates"]}
    with pytest.raises(ValueError):
        validate_circuit_dict(d, allow_nonunitary=bad["allow"])


def test_split_segments():
    cd = validate_circuit_dict({
        "number_of_qubits": 2,
        "gates": [{"qubits": [0], "gate": "H"}, _meas(0),
                  {"qubits": [1], "gate": "X"}],
    }, allow_nonunitary=True)
    segs = split_segments(cd["gates"])
    assert len(segs) == 2
    assert [g["gate"] for g in segs[0][0]] == ["H"]
    assert segs[0][1]["gate"] == "MEASURE"
    assert [g["gate"] for g in segs[1][0]] == ["X"]
    assert segs[1][1] is None


# ---------------------------------------------------------------------------
# importer

TELEPORT = """
OPENQASM 2.0;
include "qelib1.inc";
qreg q[3];
creg m0[1];
creg m1[1];
// entangle q1,q2
h q[1];
cx q[1],q[2];
// Bell-measure source against q1
cx q[0],q[1];
h q[0];
measure q[0] -> m0[0];
measure q[1] -> m1[0];
// corrections on q2
if(m1==1) x q[2];
if(m0==1) z q[2];
"""


def test_import_trajectory_mode():
    cd = qasm_to_dict(TELEPORT, nonunitary="trajectory")
    names = [g["gate"] for g in cd["gates"]]
    assert names == ["H", "CNOT", "CNOT", "H", "MEASURE", "MEASURE", "X", "Z"]
    assert cd["gates"][4]["params"] == {"creg": "m0", "cbit": 0}
    assert cd["gates"][6]["cond"] == {"creg": "m1", "value": 1}
    assert cd["gates"][7]["cond"] == {"creg": "m0", "value": 1}
    # default mode: measure skipped, if raises
    with pytest.raises(QasmError):
        qasm_to_dict(TELEPORT)


def test_import_reset_and_broadcast_measure():
    src = """
    OPENQASM 2.0;
    qreg q[2];
    creg c[2];
    h q[0];
    reset q[0];
    measure q -> c;
    """
    cd = qasm_to_dict(src, nonunitary="trajectory")
    assert [g["gate"] for g in cd["gates"]] == ["H", "RESET", "MEASURE",
                                                "MEASURE"]
    assert cd["gates"][2]["params"] == {"creg": "c", "cbit": 0}
    assert cd["gates"][3]["params"] == {"creg": "c", "cbit": 1}
    with pytest.raises(QasmError):
        qasm_to_dict(src)  # reset in default mode


@pytest.mark.parametrize("stmt", [
    "measure q[0] -> d[0];",          # unknown creg
    "measure q[0] -> c[5];",          # bit out of range
    "if(d==1) x q[0];",               # unknown creg in cond
    "if(c==1) measure q[0] -> c[0];",  # conditional measure
])
def test_import_trajectory_errors(stmt):
    src = f"OPENQASM 2.0;\nqreg q[2];\ncreg c[2];\nh q[0];\n{stmt}\n"
    with pytest.raises(QasmError):
        qasm_to_dict(src, nonunitary="trajectory")


# ---------------------------------------------------------------------------
# runtime vs oracle twin

MIXED = """
OPENQASM 2.0;
qreg q[4];
creg c[2];
h q[0];
cx q[0],q[1];
measure q[0] -> c[0];
if(c==1) x q[2];
reset q[1];
h q[1];
rz(pi/3) q[2];
measure q[1] -> c[1];
if(c==3) z q[3];
h q[3];
cp(pi/4) q[2],q[3];
"""


@pytest.mark.parametrize("seed", range(8))
def test_runtime_matches_oracle(seed):
    cd = qasm_to_dict(MIXED, nonunitary="trajectory")
    psi, cregs, outs = simulate_trajectory(cd, seed=seed,
                                           dtype=jnp.complex128)
    psi_o, cregs_o, outs_o = oracle.simulate_trajectory(cd, seed=seed)
    assert outs == outs_o
    assert cregs == cregs_o
    np.testing.assert_allclose(np.asarray(psi), psi_o, atol=1e-12)


def test_runtime_matches_oracle_unfused():
    cd = qasm_to_dict(MIXED, nonunitary="trajectory")
    psi, _, outs = simulate_trajectory(cd, seed=3, dtype=jnp.complex128,
                                       use_fusion=False, panel_width=None)
    psi_o, _, outs_o = oracle.simulate_trajectory(cd, seed=3)
    assert outs == outs_o
    np.testing.assert_allclose(np.asarray(psi), psi_o, atol=1e-12)


def test_outcome_distribution():
    """H then MEASURE: outcome follows the uniform draw against P(1)=0.5."""
    cd = {"number_of_qubits": 1,
          "gates": [{"qubits": [0], "gate": "H"}, _meas(0)]}
    outs = [simulate_trajectory(cd, seed=s)[2][0] for s in range(64)]
    assert 10 < sum(outs) < 54  # both branches exercised


# ---------------------------------------------------------------------------
# outcome-independent invariants


@pytest.mark.parametrize("seed", range(6))
def test_teleportation_identity(seed):
    """Teleport a random 1q state: q2 must equal the input state for
    EVERY measurement branch — validates collapse + classical
    conditioning without trusting the oracle twin."""
    rng = np.random.default_rng(99)
    v = rng.standard_normal(2) + 1j * rng.standard_normal(2)
    v /= np.linalg.norm(v)
    # input state |v> on q0, |00> on q1,q2  (little-endian axis order)
    init = np.zeros(8, dtype=np.complex128)
    init[0], init[1] = v[0], v[1]
    cd = qasm_to_dict(TELEPORT, nonunitary="trajectory")
    psi, cregs, outs = simulate_trajectory(
        cd, seed=seed, dtype=jnp.complex128, initial_state=init)
    psi = np.asarray(psi).reshape(2, 2, 2)  # [q2, q1, q0]
    # q0,q1 collapsed to |outs>: the q2 amplitude vector sits at that index
    got = psi[:, outs[1], outs[0]]
    phase = got[np.argmax(np.abs(v))] / v[np.argmax(np.abs(v))]
    np.testing.assert_allclose(got, v * phase, atol=1e-12)
    assert abs(abs(phase) - 1) < 1e-12


def test_reset_reuses_ancilla():
    """RESET mid-circuit returns the ancilla to |0> so it can be reused:
    X a; RESET a; (a now |0>); CX d,a entangles freshly."""
    cd = {"number_of_qubits": 2, "gates": [
        {"qubits": [1], "gate": "X"},
        {"qubits": [1], "gate": "RESET"},
        {"qubits": [0], "gate": "H"},
        {"qubits": [0, 1], "gate": "CNOT"},
    ]}
    psi, _, outs = simulate_trajectory(cd, seed=0, dtype=jnp.complex128)
    assert outs == [1]  # ancilla was deterministically |1>
    expect = np.zeros(4, dtype=np.complex128)
    expect[0] = expect[3] = 1 / math.sqrt(2)
    np.testing.assert_allclose(np.asarray(psi), expect, atol=1e-12)


def test_deterministic_measurement_branch():
    cd = {"number_of_qubits": 1, "gates": [_meas(0)]}  # |0>, P(1)=0
    psi, _, outs = simulate_trajectory(cd, seed=0)
    assert outs == [0]
    np.testing.assert_allclose(np.asarray(psi)[0], 1.0, atol=1e-6)


# ---------------------------------------------------------------------------
# api routing


def test_api_routes_trajectory():
    cd = qasm_to_dict(MIXED, nonunitary="trajectory")
    cfg = SimulatorConfig(dtype="complex128", log_level="",
                          trajectory_seed=5)
    psi = api.simulate(cd, cfg)
    psi_o, _, _ = oracle.simulate_trajectory(cd, seed=5)
    np.testing.assert_allclose(np.asarray(psi), psi_o, atol=1e-12)
    # determinism: same seed -> identical state
    psi2 = api.simulate(cd, cfg)
    np.testing.assert_allclose(np.asarray(psi), np.asarray(psi2), atol=0)


# ---------------------------------------------------------------------------
# corpus files that NEED the trajectory tier (reference can't run them:
# it drops reset and chokes on if — qasm_assembler_standalone.py:525)

import os

_CLUSTER = ("/root/reference/v3_hisvsim_spark/hisvsim_repo/QASMBench/"
            "cluster")
_NONUNITARY_CORPUS = ["cc_n28", "bwt_n29", "bwt_n33", "square_root_n27",
                      "square_root_n30", "square_root_n33"]


@pytest.mark.skipif(not os.path.isdir(_CLUSTER),
                    reason="reference corpus not present")
@pytest.mark.parametrize("name", _NONUNITARY_CORPUS)
def test_corpus_nonunitary_parses(name):
    path = os.path.join(_CLUSTER, name, f"{name}.qasm")
    with pytest.raises(QasmError):
        qasm_to_dict(open(path).read())
    cd = qasm_to_dict(open(path).read(), nonunitary="trajectory")
    v = validate_circuit_dict(cd, allow_nonunitary=True)
    assert v["number_of_qubits"] >= 27
    assert has_nonunitary(v)
