"""jnp dense engine vs numpy oracle (kernel-equivalence tier).

Parity with the reference's test_kernel_vs_ref.py: every gate and
every application path (elementwise planes, einsum multi-qubit, fused
low panels) must match the complex128 oracle — at 1e-10 in complex128
mode, at ~1e-5 in complex64 (the TPU production dtype).
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from quantum_simulations_tpu.circuit import gates as G
from quantum_simulations_tpu.circuit import library as lib
from quantum_simulations_tpu.circuit.fusion import compile_steps, fusion_stats
from quantum_simulations_tpu.oracle import dense_numpy as oracle
from quantum_simulations_tpu.ops import dense
from quantum_simulations_tpu.runtime import simulator


def _rand_state(n, seed=0):
    rng = np.random.default_rng(seed)
    psi = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    return (psi / np.linalg.norm(psi)).astype(np.complex128)


# ---------------------------------------------------------------------------
# Op-level equivalence on random states
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("q", range(5))
@pytest.mark.parametrize("name", ["H", "X", "Y", "Z", "S", "T"])
def test_apply_1q_matches_oracle(q, name):
    n = 5
    psi = _rand_state(n)
    U = G.gate_matrix(name, {})
    want = oracle.apply_gate(psi, [q], U)
    got = np.asarray(dense.apply_1q(jnp.asarray(psi), q, U))
    np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("qa,qb", [(0, 1), (1, 0), (0, 4), (4, 0), (2, 3), (3, 1)])
@pytest.mark.parametrize("name", ["CNOT", "SWAP", "CZ", "CY"])
def test_apply_2q_matches_oracle(qa, qb, name):
    n = 5
    psi = _rand_state(n, seed=qa * 7 + qb)
    U = G.gate_matrix(name, {})
    want = oracle.apply_gate(psi, [qa, qb], U)
    got = np.asarray(dense.apply_2q(jnp.asarray(psi), qa, qb, U))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_apply_2q_cr_cu():
    n = 4
    psi = _rand_state(n, seed=3)
    U = G.gate_matrix("CR", {"k": 3})
    want = oracle.apply_gate(psi, [2, 0], U)
    got = np.asarray(dense.apply_2q(jnp.asarray(psi), 2, 0, U))
    np.testing.assert_allclose(got, want, atol=1e-12)

    U = G.gate_matrix("CU", {"U": [[0, 1], [1, 0]], "exponent": 3})
    want = oracle.apply_gate(psi, [1, 3], U)
    got = np.asarray(dense.apply_2q(jnp.asarray(psi), 1, 3, U))
    np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("qubits", [(0, 1, 2), (2, 0, 3), (4, 1, 3)])
def test_apply_mq_einsum_matches_oracle(qubits):
    n = 5
    psi = _rand_state(n, seed=11)
    U = G.gate_matrix("CCX", {})
    want = oracle.apply_gate(psi, list(qubits), U)
    got = np.asarray(dense.apply_mq_einsum(jnp.asarray(psi), qubits, U))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_apply_mq_einsum_2q_agrees_with_planes():
    n = 6
    psi = _rand_state(n, seed=2)
    U = G.gate_matrix("CY", {})
    a = np.asarray(dense.apply_2q(jnp.asarray(psi), 4, 1, U))
    b = np.asarray(dense.apply_mq_einsum(jnp.asarray(psi), (4, 1), U))
    np.testing.assert_allclose(a, b, atol=1e-12)


# ---------------------------------------------------------------------------
# Low-panel expansion / fusion
# ---------------------------------------------------------------------------

def test_expand_to_low_block_1q():
    U = G.gate_matrix("H", {})
    W = dense.expand_to_low_block((1,), U, width=2)
    # H on qubit 1 of a 2-qubit block, little-endian: index = q1<<1 | q0.
    psi = _rand_state(2)
    want = oracle.apply_gate(psi, [1], U)
    np.testing.assert_allclose(W @ psi, want, atol=1e-12)


def test_expand_to_low_block_2q_ordering():
    U = G.gate_matrix("CNOT", {})
    for qubits in [(0, 2), (2, 0), (1, 2), (2, 1)]:
        W = dense.expand_to_low_block(qubits, U, width=3)
        psi = _rand_state(3, seed=5)
        want = oracle.apply_gate(psi, list(qubits), U)
        np.testing.assert_allclose(W @ psi, want, atol=1e-12)


def test_apply_low_panel_matches_sequential():
    n = 6
    width = 3
    ops = [
        ((0,), G.gate_matrix("H", {})),
        ((1, 0), G.gate_matrix("CNOT", {})),
        ((2,), G.gate_matrix("T", {})),
        ((0, 2), G.gate_matrix("CZ", {})),
    ]
    W = dense.compose_low_panel(ops, width)
    psi = _rand_state(n, seed=9)
    want = psi
    for qubits, U in ops:
        want = oracle.apply_gate(want, list(qubits), U)
    got = np.asarray(dense.apply_low_panel(jnp.asarray(psi), W))
    np.testing.assert_allclose(got, want, atol=1e-12)


# ---------------------------------------------------------------------------
# End-to-end circuits vs oracle
# ---------------------------------------------------------------------------

CIRCUITS = [
    ("bell", lib.bell()),
    ("ghz6", lib.ghz(6)),
    ("qft5", lib.qft(5)),
    ("qft8", lib.qft(8)),
    ("w5", lib.w_state(5)),
    ("qpe", lib.qpe(4)),
    ("random", lib.random_circuit(7, 60, seed=2)),
    ("qaoa", lib.qaoa_maxcut(7, p=2)),
    ("sycamore", lib.sycamore_like(8, depth=6)),
    ("nonstab", lib.non_stabilizer(7, depth=3)),
]


@pytest.mark.parametrize("tag,cd", CIRCUITS, ids=[c[0] for c in CIRCUITS])
def test_engine_vs_oracle_c128(tag, cd):
    want = oracle.simulate(cd)
    got = simulator.simulate_np(cd, dtype=jnp.complex128)
    np.testing.assert_allclose(got, want, atol=1e-10)


@pytest.mark.parametrize("tag,cd", CIRCUITS[:6], ids=[c[0] for c in CIRCUITS[:6]])
def test_engine_vs_oracle_c64(tag, cd):
    want = oracle.simulate(cd)
    got = simulator.simulate_np(cd, dtype=jnp.complex64)
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("fusion", [True, False])
@pytest.mark.parametrize("panel", [None, 3, 7])
def test_engine_flag_matrix(fusion, panel):
    cd = lib.random_circuit(6, 50, seed=13)
    want = oracle.simulate(cd)
    got = simulator.simulate_np(
        cd, dtype=jnp.complex128, use_fusion=fusion, panel_width=panel
    )
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_initial_state_roundtrip():
    cd = lib.qft(4)
    psi0 = _rand_state(4, seed=21)
    want = oracle.simulate(cd, initial_state=psi0)
    got = simulator.simulate_np(cd, dtype=jnp.complex128, initial_state=psi0)
    np.testing.assert_allclose(got, want, atol=1e-10)


# ---------------------------------------------------------------------------
# Fusion semantics
# ---------------------------------------------------------------------------

def test_fuse_order_t_after_h():
    """T after H must compose as T @ H (application order preserved)."""
    from quantum_simulations_tpu.circuit.fusion import GateOp, fuse_1q_ops
    ops = [
        GateOp((0,), G.gate_matrix("H", {}), "H"),
        GateOp((0,), G.gate_matrix("T", {}), "T"),
    ]
    fused = fuse_1q_ops(ops)
    assert len(fused) == 1
    np.testing.assert_allclose(fused[0].U, G.T() @ G.H(), atol=1e-12)


def test_2q_gate_flushes_fusion():
    from quantum_simulations_tpu.circuit.fusion import GateOp, fuse_1q_ops
    ops = [
        GateOp((0,), G.H(), "H"),
        GateOp((0, 1), G.CNOT(), "CNOT"),
        GateOp((0,), G.T(), "T"),
    ]
    fused = fuse_1q_ops(ops)
    assert [op.name for op in fused] == ["fused1q", "CNOT", "fused1q"]
    np.testing.assert_allclose(fused[0].U, G.H(), atol=1e-12)
    np.testing.assert_allclose(fused[2].U, G.T(), atol=1e-12)


def test_cross_qubit_gates_do_not_fuse():
    from quantum_simulations_tpu.circuit.fusion import GateOp, fuse_1q_ops
    ops = [GateOp((0,), G.H(), "H"), GateOp((1,), G.X(), "X")]
    fused = fuse_1q_ops(ops)
    assert len(fused) == 2


def test_batching_reduces_steps():
    # GHZ(8) at k=4: the first 4 levels (H + 3 local CNOTs) batch into one
    # step; the 4 nonlocal CNOTs stay one step each.
    stats = fusion_stats(lib.ghz(8), k=4)
    assert stats["original_levels"] == 8
    assert stats["fused_steps"] == 5
    # All-local circuit collapses into a single step.
    stats = fusion_stats(lib.qft(10), k=10)
    assert stats["fused_steps"] == 1
    assert stats["ops_after"] <= stats["ops_before"]


def test_compile_steps_classification():
    cd = {"number_of_qubits": 6, "gates": [
        {"qubits": [0], "gate": "H"},
        {"qubits": [5], "gate": "H"},         # nonlocal for k=3
        {"qubits": [0, 1], "gate": "CNOT"},
        {"qubits": [2, 5], "gate": "CNOT"},   # nonlocal for k=3
    ]}
    steps = compile_steps(cd, k=3, use_fusion=True)
    all_nonlocal = [op for s in steps for op in s.nonlocal_ops]
    assert len(all_nonlocal) == 2
    for op in all_nonlocal:
        assert any(q >= 3 for q in op.qubits)
    steps_all_local = compile_steps(cd, k=6, use_fusion=True)
    assert all(not s.nonlocal_ops for s in steps_all_local)
    assert len(steps_all_local) == 1  # everything batches into one pass


def test_max_levels_per_step_bounds_batching():
    """The step-granularity bound: all-local circuits split into
    ceil(levels/max) steps so the WAL runner has real checkpoint
    cadence single-chip (reference: per-pass commits,
    wenbo_engine/runner/single_node.py)."""
    cd = lib.qft(10)  # 19 dependency levels, all local at k=10
    base = compile_steps(cd, k=10)
    assert len(base) == 1
    total_levels = sum(len(s.level_indices) for s in base)
    for m in (1, 2, 4):
        steps = compile_steps(cd, k=10, max_levels_per_step=m)
        assert all(len(s.level_indices) <= m for s in steps)
        assert sum(len(s.level_indices) for s in steps) == total_levels
        assert len(steps) >= -(-total_levels // m)
        # the bound never drops or duplicates work: level indices
        # partition the original range
        idx = [i for s in steps for i in s.level_indices]
        assert idx == sorted(set(idx))
