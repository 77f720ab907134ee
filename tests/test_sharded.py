"""Sharded-engine tests on a virtual 8-device CPU mesh.

Parity with the reference's non-local grid (wenbo_engine/tests/
test_nonlocal.py): tiny shards force every cross-shard case —
1Q nonlocal, 2Q with either qubit nonlocal, 2Q with both nonlocal —
plus the comm-elision planner (diagonal / control-on-device gates must
cost zero or one exchange, never more than the structure requires).
"""
import math

import jax
import numpy as np
import pytest

from quantum_simulations_tpu.circuit import gates as G
from quantum_simulations_tpu.circuit import library as lib
from quantum_simulations_tpu.oracle import dense_numpy as oracle
from quantum_simulations_tpu.ops import exchange
from quantum_simulations_tpu.parallel import executor as E
from quantum_simulations_tpu.parallel import mesh as M


def _run(mesh, cd, **kw):
    psi = E.simulate_sharded(mesh, cd, dtype="complex128", **kw)
    return E.collect_state(psi)


@pytest.fixture(scope="module")
def mesh8():
    return M.make_mesh(8)


@pytest.fixture(scope="module")
def mesh2():
    return M.make_mesh(2)


# ---------------------------------------------------------------------------
# Systematic single-gate grid: n=5, 8 devices => k=2 (qubits 2,3,4 nonlocal)
# ---------------------------------------------------------------------------

def _prep_plus_gate(n, gate_entry, seed=0):
    """Random-ish separable prep (H wall + phases) followed by one gate."""
    gates = [{"qubits": [q], "gate": "H"} for q in range(n)]
    gates += [{"qubits": [q], "gate": "T"} for q in range(0, n, 2)]
    gates += [{"qubits": [q], "gate": "RY", "params": {"theta": 0.3 + q}}
              for q in range(n)]
    gates.append(gate_entry)
    return {"number_of_qubits": n, "gates": gates}


@pytest.mark.parametrize("q", range(5))
@pytest.mark.parametrize("name", ["H", "X", "Y", "T", "RY"])
def test_1q_every_position(mesh8, q, name):
    entry = {"qubits": [q], "gate": name}
    if name == "RY":
        entry["params"] = {"theta": 0.77}
    cd = _prep_plus_gate(5, entry)
    np.testing.assert_allclose(_run(mesh8, cd), oracle.simulate(cd), atol=1e-10)


# All (qa, qb) pairs across the k=2 boundary of n=5 on 8 devices.
_PAIRS = [
    (0, 1),            # both local
    (0, 3), (3, 0),    # one local, one device (both orders)
    (1, 4), (4, 1),
    (2, 3), (4, 2),    # both device bits
    (3, 4), (2, 4),
]


@pytest.mark.parametrize("qa,qb", _PAIRS)
@pytest.mark.parametrize("name", ["CNOT", "SWAP", "CZ", "CY", "CR"])
def test_2q_every_split(mesh8, qa, qb, name):
    entry = {"qubits": [qa, qb], "gate": name}
    if name == "CR":
        entry["params"] = {"k": 2}
    cd = _prep_plus_gate(5, entry)
    np.testing.assert_allclose(_run(mesh8, cd), oracle.simulate(cd), atol=1e-10)


def test_3q_gate_across_boundary(mesh8):
    cd = _prep_plus_gate(5, {"qubits": [0, 2, 4], "gate": "CCX"})
    np.testing.assert_allclose(_run(mesh8, cd), oracle.simulate(cd), atol=1e-10)
    cd = _prep_plus_gate(5, {"qubits": [4, 3, 2], "gate": "CSWAP"})
    np.testing.assert_allclose(_run(mesh8, cd), oracle.simulate(cd), atol=1e-10)


# ---------------------------------------------------------------------------
# Full circuits at multiple mesh sizes
# ---------------------------------------------------------------------------

CIRCUITS = [
    ("ghz8", lib.ghz(8)),
    ("qft7", lib.qft(7)),
    ("w6", lib.w_state(6)),
    ("qpe5", lib.qpe(4)),
    ("random", lib.random_circuit(7, 70, seed=9)),
    ("qaoa", lib.qaoa_maxcut(7, p=2)),
    ("sycamore", lib.sycamore_like(7, depth=5)),
]


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
@pytest.mark.parametrize("tag,cd", CIRCUITS, ids=[c[0] for c in CIRCUITS])
def test_circuits_all_mesh_sizes(n_dev, tag, cd):
    mesh = M.make_mesh(n_dev)
    np.testing.assert_allclose(_run(mesh, cd), oracle.simulate(cd), atol=1e-10)


@pytest.mark.parametrize("fusion", [True, False])
def test_fusion_flag_sharded(mesh8, fusion):
    cd = lib.random_circuit(6, 40, seed=17)
    got = _run(mesh8, cd, use_fusion=fusion)
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-10)


def test_initial_state_sharded(mesh2):
    rng = np.random.default_rng(0)
    psi0 = rng.normal(size=32) + 1j * rng.normal(size=32)
    psi0 /= np.linalg.norm(psi0)
    cd = lib.qft(5)
    got = _run(mesh2, cd, initial_state=psi0)
    want = oracle.simulate(cd, initial_state=psi0)
    np.testing.assert_allclose(got, want, atol=1e-10)


# ---------------------------------------------------------------------------
# Communication-elision planner
# ---------------------------------------------------------------------------

def test_diagonal_gates_cost_zero_traffic():
    k = 3
    assert exchange.exchange_cost(G.Z(), (5,), k) == 0
    assert exchange.exchange_cost(G.CZ(), (4, 6), k) == 0
    assert exchange.exchange_cost(G.gate_matrix("CR", {"k": 2}), (3, 7), k) == 0
    assert exchange.exchange_cost(G.gate_matrix("RZZ", {"theta": 1.0}), (3, 4), k) == 0


def test_control_on_device_bit_costs_nothing_or_one():
    k = 3
    # control (qubits[0]) on device bit, target local: zero exchanges.
    assert exchange.exchange_cost(G.CNOT(), (5, 1), k) == 0
    assert exchange.exchange_cost(G.CY(), (4, 0), k) == 0
    # control local, target on device bit: one exchange.
    assert exchange.exchange_cost(G.CNOT(), (1, 5), k) == 1
    # both on device bits: one exchange (target bit only), not three.
    assert exchange.exchange_cost(G.CNOT(), (4, 5), k) == 1


def test_generic_gate_costs():
    k = 3
    assert exchange.exchange_cost(G.H(), (5,), k) == 1      # butterfly
    assert exchange.exchange_cost(G.H(), (1,), k) == 0      # local
    assert exchange.exchange_cost(G.SWAP(), (3, 4), k) == 1  # swap: x=11 only
    # Generic dense 2q across two device bits: up to 3 exchanges.
    U = G.gate_matrix("RXX", {"theta": 0.3})
    assert exchange.exchange_cost(U, (3, 4), k) == 1  # RXX couples only x=11
    rng = np.random.default_rng(1)
    A = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    Q, _ = np.linalg.qr(A)
    assert exchange.exchange_cost(Q, (3, 4), k) == 3


def test_swap_across_boundary_is_one_permute():
    # SWAP(local, device): offsets x=0 (diag) and x=1 survive.
    k = 3
    assert exchange.exchange_cost(G.SWAP(), (0, 5), k) == 1


# ---------------------------------------------------------------------------
# Norm preservation & determinism across meshes
# ---------------------------------------------------------------------------

def test_mesh_size_consistency():
    cd = lib.sycamore_like(6, depth=4, seed=5)
    results = [_run(M.make_mesh(nd), cd) for nd in (1, 2, 4, 8)]
    for r in results[1:]:
        np.testing.assert_allclose(r, results[0], atol=1e-12)


# ---------------------------------------------------------------------------
# Bytes-level traffic accounting (half-volume single-cell dispatch)
# ---------------------------------------------------------------------------

def test_traffic_swap_half_volume():
    # Matrix-form boundary SWAP: two offsets survive, x=0 is local, the
    # exchange offset ships only the active plane => half a shard.
    k = 3
    t = exchange.offset_traffic(G.SWAP(), (1, 5), k)
    assert len(t) == 1 and t[0][1] == 0.5
    assert exchange.exchange_bytes(G.SWAP(), (1, 5), k) == (1 << k) * 8 // 2


def test_traffic_cnot_target_on_device_bit():
    # CNOT control local / target on a device bit: one half-volume
    # exchange (only the control=1 plane moves).
    k = 3
    t = exchange.offset_traffic(G.CNOT(), (1, 5), k)
    assert t == [(1, 0.5)]


def test_traffic_generic_2q_full_volume():
    # Generic 2q with one device bit: dense 4x4 couples both planes.
    k = 3
    U = oracle_random_unitary(4, seed=0)
    t = exchange.offset_traffic(U, (1, 5), k)
    assert [frac for _, frac in t] == [1.0]


def test_traffic_1q_butterfly_full_shard():
    k = 3
    t = exchange.offset_traffic(G.H(), (5,), k)
    assert t == [(1, 1.0)]  # p=0: whole shard, one round


def oracle_random_unitary(dim, seed):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(dim, dim)) + 1j * rng.normal(size=(dim, dim))
    q, _ = np.linalg.qr(a)
    return q


# ---------------------------------------------------------------------------
# Sharded window mode: planar Pallas panels inside shard_map
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("tag,cd_fn", [
    ("ghz12", lambda: lib.ghz(12)),
    ("qft10", lambda: lib.qft(10)),
    ("random11", lambda: lib.random_circuit(11, 60, seed=4)),
    ("sycamore10", lambda: lib.sycamore_like(10, depth=4, seed=1)),
])
def test_window_mode_sharded_vs_oracle(mesh8, tag, cd_fn):
    cd = cd_fn()
    got = E.collect_state(E.simulate_sharded(
        mesh8, cd, dtype="complex128", mode="window"))
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-10)


def test_window_mode_merged_diag_k10(mesh8):
    # k = 13 - 3 = 10 crosses the terms-only diag-merge gate: the
    # shard-local CR phase sweeps of QFT run as merged DiagOps inside
    # shard_map (the same small-table path the single-chip tier uses).
    cd = lib.qft(13)
    got = E.collect_state(E.simulate_sharded(
        mesh8, cd, dtype="complex128", mode="window"))
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-10)


def test_window_mode_decomposed_bitperm_k17(mesh8):
    # k = 20 - 3 = 17 crosses the terminal-bitperm decomposition gate:
    # the shard-local QFT bit-reversal runs as the index-map
    # BitPermGridOp + native-transpose crossing INSIDE shard_map (the
    # lane permutation folded into a shard-local panel operator).
    from quantum_simulations_tpu.circuit import gates as G
    from quantum_simulations_tpu.circuit.contract import (
        validate_circuit_dict)
    from quantum_simulations_tpu.circuit.panelize import (
        TransposeCrossOp, compile_window_ops)

    cd = lib.qft(20)
    local = [(tuple(g["qubits"]),
              G.gate_matrix(g["gate"], g["params"]), g["gate"])
             for g in validate_circuit_dict(lib.qft(17))["gates"]]
    kops = compile_window_ops(local, 17, diag_terms_only=True)
    assert any(isinstance(o, TransposeCrossOp) for o in kops)

    got = E.collect_state(E.simulate_sharded(
        mesh8, cd, dtype="complex128", mode="window"))
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-10)


def test_window_mode_mesh2(mesh2):
    cd = lib.qft(9)
    got = E.collect_state(E.simulate_sharded(
        mesh2, cd, dtype="complex128", mode="window"))
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-10)


def test_window_mode_staged(mesh8):
    from quantum_simulations_tpu.circuit.staging import (
        permute_state, stage_circuit,
    )
    cd = lib.random_circuit(10, 80, seed=9)
    staged, log2phys, _ = stage_circuit(cd, k=7, method="heuristic")
    got = E.collect_state(E.simulate_sharded(
        mesh8, staged, dtype="complex128", mode="window"))
    got = permute_state(got, log2phys)
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-10)
