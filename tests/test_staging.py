"""Staging scheduler tests (reference parity: wenbo_engine/tests/test_staging.py)."""
import numpy as np
import pytest

from quantum_simulations_tpu.circuit import gates as G
from quantum_simulations_tpu.circuit import library as lib
from quantum_simulations_tpu.circuit import staging
from quantum_simulations_tpu.oracle import dense_numpy as oracle
from quantum_simulations_tpu.parallel import mesh as M
from quantum_simulations_tpu.runtime import runner


# ---------------------------------------------------------------------------
# Insularity from matrix structure
# ---------------------------------------------------------------------------

def test_insular_detection():
    assert staging.non_insular_qubits({"qubits": [3], "gate": "Z"}) == []
    assert staging.non_insular_qubits({"qubits": [3], "gate": "T"}) == []
    assert staging.non_insular_qubits({"qubits": [3], "gate": "H"}) == [3]
    # CNOT: control (qubits[0]) is insular, target is not.
    assert staging.non_insular_qubits({"qubits": [2, 5], "gate": "CNOT"}) == [5]
    assert staging.non_insular_qubits({"qubits": [2, 5], "gate": "CZ"}) == []
    assert staging.non_insular_qubits(
        {"qubits": [2, 5], "gate": "CR", "params": {"k": 2}}) == []
    assert staging.non_insular_qubits({"qubits": [2, 5], "gate": "SWAP"}) == [2, 5]
    # CCX: both controls insular.
    assert staging.non_insular_qubits({"qubits": [0, 1, 2], "gate": "CCX"}) == [2]


# ---------------------------------------------------------------------------
# QubitMap
# ---------------------------------------------------------------------------

def test_qubitmap_swap():
    qm = staging.QubitMap(4)
    qm.swap_phys(0, 3)
    assert qm.phys(0) == 3 and qm.phys(3) == 0
    assert qm.log(0) == 3 and qm.log(3) == 0
    qm.swap_phys(0, 3)
    assert qm.log2phys == [0, 1, 2, 3]


# ---------------------------------------------------------------------------
# permute_state
# ---------------------------------------------------------------------------

def test_permute_state_roundtrip():
    rng = np.random.default_rng(0)
    n = 4
    psi = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    l2p = [2, 0, 3, 1]
    out = staging.permute_state(psi, l2p)
    # logical basis index q0=1 -> physical bit 2 set.
    for logical in range(1 << n):
        phys = 0
        for q in range(n):
            if (logical >> q) & 1:
                phys |= 1 << l2p[q]
        assert out[logical] == psi[phys]


def test_permute_state_identity_fast_path():
    psi = np.arange(8, dtype=complex)
    assert staging.permute_state(psi, [0, 1, 2]) is psi


# ---------------------------------------------------------------------------
# Staged-circuit equivalence vs oracle (all methods)
# ---------------------------------------------------------------------------

CIRCUITS = [
    ("qft7", lib.qft(7), 4),
    ("random", lib.random_circuit(7, 60, seed=3), 4),
    ("ghz8", lib.ghz(8), 5),
    ("sycamore", lib.sycamore_like(6, depth=4), 3),
    ("w6", lib.w_state(6), 3),
]


@pytest.mark.parametrize("method", ["heuristic", "greedy", "ilp"])
@pytest.mark.parametrize("tag,cd,k", CIRCUITS, ids=[c[0] for c in CIRCUITS])
def test_staged_equals_oracle(tag, cd, k, method):
    staged, l2p, stats = staging.stage_circuit(cd, k, method)
    got = staging.permute_state(oracle.simulate(staged), l2p)
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-10)
    assert stats["stages"] >= 1


def test_staging_reduces_exchanges_on_random():
    cd = lib.random_circuit(7, 60, seed=3)
    stats = staging.staging_stats(cd, k=4, method="heuristic")
    assert stats["exchanges_staged"] < stats["exchanges_unstaged"]


def test_stage_noop_when_all_local():
    cd = lib.qft(5)
    staged, l2p, stats = staging.stage_circuit(cd, k=5)
    assert stats["swaps"] == 0
    assert len(staged["gates"]) == len(cd["gates"])
    assert l2p == list(range(5))


# ---------------------------------------------------------------------------
# Runner integration (staging + WAL + sharded execution + collect)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("method", ["auto", "heuristic"])
def test_runner_with_staging(tmp_path, method):
    cd = lib.random_circuit(6, 50, seed=21)
    mesh = M.make_mesh(8)
    runner.run(cd, tmp_path, mesh=mesh, dtype="complex128",
               use_staging=True, staging_method=method)
    got = runner.collect_state(tmp_path)
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-10)


def test_runner_auto_skips_staging_for_qft(tmp_path):
    # QFT's nonlocal gates are mostly diagonal: auto must not stage.
    import json
    cd = lib.qft(6)
    mesh = M.make_mesh(4)
    runner.run(cd, tmp_path, mesh=mesh, dtype="complex128",
               use_staging=True, staging_method="auto")
    mapping = json.loads((tmp_path / "qubit_mapping.json").read_text())
    assert mapping["log2phys"] is None
    np.testing.assert_allclose(
        runner.collect_state(tmp_path), oracle.simulate(cd), atol=1e-10
    )


# ---------------------------------------------------------------------------
# Real ILP/branch-and-bound staging (not a heuristic passthrough)
# ---------------------------------------------------------------------------

def test_ilp_bb_reports_its_method():
    cd = lib.qft(6)
    _, _, st = staging.stage_circuit(cd, 3, method="ilp")
    # PuLP is absent in this image: the exact branch-and-bound runs.
    assert st["method"] in ("ilp", "ilp-bb")


def test_ilp_never_worse_than_heuristic():
    for seed in range(6):
        cd = lib.random_circuit(7, 18, seed=seed)
        for k in (2, 3, 4):
            st_i = staging.stage_circuit(cd, k, method="ilp")[2]
            st_h = staging.stage_circuit(cd, k, method="heuristic")[2]
            assert st_i["stages"] <= st_h["stages"], (seed, k)


def test_ilp_strictly_beats_heuristic_where_it_should():
    # QFT-6 at k=3: the exact search finds a 4-stage schedule where the
    # lookahead heuristic needs 5 — the optimality claim is load-bearing.
    cd = lib.qft(6)
    st_i = staging.stage_circuit(cd, 3, method="ilp")[2]
    st_h = staging.stage_circuit(cd, 3, method="heuristic")[2]
    assert st_i["stages"] < st_h["stages"]


@pytest.mark.parametrize("k", [2, 3, 4])
def test_ilp_schedule_correct_vs_oracle(k):
    for cd in (lib.qft(6), lib.random_circuit(8, 40, seed=2), lib.w_state(6)):
        out, l2p, _ = staging.stage_circuit(cd, k, method="ilp")
        got = staging.permute_state(oracle.simulate(out), l2p)
        np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-10)


def test_sets_to_schedule_safety_net():
    # Deliberately too few stage sets: the realiser must finish the
    # circuit with extra heuristic stages, still bit-correct.
    cd = lib.qft(6)
    out, l2p, st = staging._sets_to_schedule(cd, 3, [[0, 1, 2]])
    got = staging.permute_state(oracle.simulate(out), l2p)
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-10)
    assert st["stages"] >= 2
