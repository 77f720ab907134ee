"""Straddler-fold correctness: a (6, 7..13) gate folded into the
following (0,7) dual panel as a VPU prologue
(`panelize._fold_straddlers` + `pallas_kernels._straddle_prologue`).

The (6, qb) pairs fit no window (`_fit_start` forbidden zone) and cost
a dedicated full-state pass otherwise — the round-4 audit's weakest
row.  Reference kernel tier analogue: `hisvsim_repo/basic_gates.hpp`
(fused gate functors over gathered tiles).
"""
import jax
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from quantum_simulations_tpu.circuit.panelize import (
    DualPanelOp, PhysGateOp, compile_window_schedule,
)
from quantum_simulations_tpu.oracle import dense_numpy as oracle
from quantum_simulations_tpu.runtime import simulator


def _rand_u4(rng):
    a = rng.standard_normal((4, 4)) + 1j * rng.standard_normal((4, 4))
    q, _r = np.linalg.qr(a)
    return q


def _dense_two_panel_circuit(n, rng, straddler_gates):
    """H/T/CNOT filler covering [0,14) so the schedule forms panels at
    pos 0 and 7, with `straddler_gates` inserted between phases."""
    gates = []
    for q in range(min(14, n)):
        gates.append({"qubits": [q], "gate": "H"})
    for q in range(6):
        gates.append({"qubits": [q, q + 1], "gate": "CNOT"})
    for q in range(7, 13):
        gates.append({"qubits": [q, q + 1], "gate": "CNOT"})
    gates += straddler_gates
    for q in range(min(14, n)):
        gates.append({"qubits": [q], "gate": "T" if q % 2 else "H"})
    for q in range(6):
        gates.append({"qubits": [q + 1, q], "gate": "CNOT"})
    for q in range(7, 13):
        gates.append({"qubits": [q + 1, q], "gate": "CNOT"})
    return {"number_of_qubits": n, "gates": gates}


def _fold_count(ops):
    return sum((op.pre_straddle is not None)
               + (op.post_straddle is not None)
               for op in ops if isinstance(op, DualPanelOp))


def _standalone_straddlers(ops):
    return [op for op in ops
            if isinstance(op, PhysGateOp) and len(op.qubits) == 2
            and min(op.qubits) == 6 and max(op.qubits) >= 7]


def test_fold_fires_on_cnot67():
    cd = _dense_two_panel_circuit(
        16, np.random.default_rng(0),
        [{"qubits": [6, 7], "gate": "CNOT"}])
    ops = compile_window_schedule(cd, diag_terms_only=True)
    assert _fold_count(ops) >= 1
    assert not _standalone_straddlers(ops)


def test_fold_killswitch():
    import os

    cd = _dense_two_panel_circuit(
        16, np.random.default_rng(0),
        [{"qubits": [6, 7], "gate": "CNOT"}])
    os.environ["QST_STRADDLE_FOLD"] = "0"
    try:
        ops = compile_window_schedule(cd, diag_terms_only=True)
        assert _fold_count(ops) == 0
        assert _standalone_straddlers(ops)
    finally:
        del os.environ["QST_STRADDLE_FOLD"]


@pytest.mark.parametrize("n", [15, 16])
@pytest.mark.parametrize("strad", [
    [{"qubits": [6, 7], "gate": "CNOT"}],
    [{"qubits": [7, 6], "gate": "CNOT"}],          # reversed order
    [{"qubits": [6, 7], "gate": "CR", "params": {"k": 2}}],
])
def test_folded_execution_matches_oracle(n, strad):
    cd = _dense_two_panel_circuit(n, np.random.default_rng(n), strad)
    ops = compile_window_schedule(cd, diag_terms_only=True)
    diag = all(g["gate"] != "CNOT" for g in strad)
    if not diag:  # CR(6,7) is diagonal -> merged into diag runs instead
        assert _fold_count(ops) >= 1, [type(o).__name__ for o in ops]
    got = simulator.simulate_np(cd, dtype="complex128", mode="window",
                                use_fusion=True, panel_width=7)
    want = oracle.simulate(cd)
    assert float(np.max(np.abs(got - want))) < 1e-10


@pytest.mark.parametrize("qb", [7, 8, 10, 13])
def test_prologue_generic_u_any_dbit(qb):
    """Direct kernel check at A>0: a random U4 on (6, qb) via the
    dual-panel prologue vs the dense oracle, both qubit orders."""
    from quantum_simulations_tpu.ops import dense, pallas_kernels as pk

    n = 15
    rng = np.random.default_rng(qb)
    U4 = _rand_u4(rng)
    W1 = np.eye(128, dtype=np.complex128)
    W2 = np.eye(128, dtype=np.complex128)
    psi = rng.standard_normal(1 << n) + 1j * rng.standard_normal(1 << n)
    psi = (psi / np.linalg.norm(psi)).astype(np.complex64)
    re = jnp.asarray(psi.real)
    im = jnp.asarray(psi.imag)
    ore, oim = pk.dual_panel_planar(
        re, im, W1, 0, W2, 7, interpret=True,
        straddle=(6, qb, U4))
    got = np.asarray(ore) + 1j * np.asarray(oim)
    want = oracle.apply_gate(psi.astype(np.complex128), [6, qb], U4)
    assert float(np.max(np.abs(got - want))) < 1e-6  # c64 engine
