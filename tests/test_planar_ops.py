"""Planar gate application + fused-diag merging tests."""
import numpy as np
import pytest
import jax.numpy as jnp

from quantum_simulations_tpu.circuit import gates as G
from quantum_simulations_tpu.circuit.panelize import (
    PhysGateOp, _merge_diag_runs,
)
from quantum_simulations_tpu.oracle import dense_numpy as oracle
from quantum_simulations_tpu.ops import dense
from quantum_simulations_tpu.ops.pallas_kernels import from_planar, to_planar


def _rand(n, seed=0):
    rng = np.random.default_rng(seed)
    psi = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    return (psi / np.linalg.norm(psi)).astype(np.complex128)


def _roundtrip(psi, qubits, U):
    re, im = to_planar(jnp.asarray(psi))
    out = dense.apply_gate_planar(re, im, qubits, U)
    if out is None:
        return None
    return np.asarray(from_planar(out[0], out[1], jnp.complex128))


@pytest.mark.parametrize("name,q", [("H", 9), ("Y", 8), ("T", 10), ("X", 11)])
def test_planar_1q_high(name, q):
    psi = _rand(12, seed=q)
    got = _roundtrip(psi, (q,), G.gate_matrix(name, {}))
    want = oracle.apply_gate(psi, [q], G.gate_matrix(name, {}))
    np.testing.assert_allclose(got, want, atol=1e-10)


@pytest.mark.parametrize("qa,qb", [(8, 10), (10, 8), (9, 11)])
@pytest.mark.parametrize("name", ["CNOT", "CY", "SWAP"])
def test_planar_2q_high(qa, qb, name):
    psi = _rand(12, seed=qa + qb)
    U = G.gate_matrix(name, {})
    got = _roundtrip(psi, (qa, qb), U)
    want = oracle.apply_gate(psi, [qa, qb], U)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_planar_diag_wide():
    """Merged 8-qubit diagonal through the planar broadcast path."""
    psi = _rand(12, seed=3)
    rng = np.random.default_rng(5)
    qubits = (0, 2, 4, 6, 8, 9, 10, 11)
    d = np.exp(1j * rng.normal(size=1 << 8))
    U = np.diag(d)
    got = _roundtrip(psi, qubits, U)
    want = oracle.apply_gate(psi, list(qubits), U)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_planar_mixed_returns_none():
    psi = _rand(10, seed=1)
    re, im = to_planar(jnp.asarray(psi))
    assert dense.apply_gate_planar(re, im, (2, 9), G.CNOT()) is None


def test_merge_diag_runs_semantics():
    ops = [
        PhysGateOp((1, 5), G.gate_matrix("CR", {"k": 2}), "CR"),
        PhysGateOp((2, 5), G.gate_matrix("CR", {"k": 3}), "CR"),
        PhysGateOp((3,), G.Z(), "Z"),
        PhysGateOp((0, 4), G.CNOT(), "CNOT"),  # non-diag: breaks the run
        PhysGateOp((1, 4), G.gate_matrix("RZZ", {"theta": 0.3}), "RZZ"),
    ]
    merged = _merge_diag_runs(ops)
    assert len(merged) == 3
    assert merged[0].name == "fused-diag"
    assert merged[0].d.ndim == 1  # vector form, never the 2^m x 2^m matrix
    assert merged[1].name == "CNOT"
    assert merged[2].name == "RZZ"
    # Equivalence on a random state.
    psi = _rand(6, seed=7)
    want = psi
    for op in ops:
        want = oracle.apply_gate(want, list(op.qubits), op.U)
    got = psi
    for op in merged:
        U = np.diag(op.d) if hasattr(op, "d") else op.U
        got = oracle.apply_gate(got, list(op.qubits), U)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_merge_diag_cap():
    ops = [
        PhysGateOp((i, i + 1), G.gate_matrix("RZZ", {"theta": 0.1 * i}), "RZZ")
        for i in range(0, 20, 2)
    ]
    merged = _merge_diag_runs(ops, max_qubits=6)
    assert all(len(op.qubits) <= 6 for op in merged)
    assert len(merged) < len(ops)
