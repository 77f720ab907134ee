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


def test_runner_auto_picks_cheapest_plan(tmp_path):
    # auto = portfolio scored by the weighted-bytes objective: the
    # chosen plan must never cost more than running unstaged, and the
    # runner must still produce the oracle state through whatever
    # mapping the winner carries.
    cd = lib.qft(6)
    mesh = M.make_mesh(4)
    runner.run(cd, tmp_path, mesh=mesh, dtype="complex128",
               use_staging=True, staging_method="auto")
    np.testing.assert_allclose(
        runner.collect_state(tmp_path), oracle.simulate(cd), atol=1e-10
    )
    k = M.shard_width(mesh, 6)
    plan, _, st = staging.choose_staging(cd, k, bit_costs=[1.0, 1.0])
    assert st["plan_cost"] <= st["unstaged_cost"]


def test_diag_heavy_circuit_stays_unstaged():
    # A circuit whose only nonlocal gates are diagonal costs ZERO bytes
    # unstaged (the exchange planner elides their traffic): the
    # portfolio must keep it unstaged — staging could only add SWAPs.
    g = [{"qubits": [q], "gate": "H"} for q in range(3)]
    g += [{"qubits": [q, 5], "gate": "CR", "params": {"k": 2}}
          for q in range(3)]
    g += [{"qubits": [5], "gate": "T"}, {"qubits": [4], "gate": "S"}]
    cd = {"number_of_qubits": 6, "gates": g}
    plan, l2p, st = staging.choose_staging(cd, 3, bit_costs=[1, 1, 20.0])
    assert st["method"] == "unstaged" and l2p is None
    assert st["plan_cost"] == 0.0


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


# ---------------------------------------------------------------------------
# Mesh-aware (ICI/DCN) cost-model-driven staging — SURVEY §7 hard part
# ---------------------------------------------------------------------------

# Link costs of the 2-host 8-device pod mesh (asserted for a REAL
# two-process cluster in tests/test_multiprocess_dcn.py): device bits
# 0-1 intra-host (ICI), bit 2 crosses hosts (DCN).
POD2_COSTS = [1.0, 1.0, 20.0]


def _dcn_trap_circuit():
    """Crafted so the cost-blind heuristic pays THREE DCN crossings.

    q5 (the DCN bit) has just enough early demand that the blind
    lookahead pulls it local in stage 1, evicts it for the q2 chain in
    stage 2, and re-fetches it for the chain-gated CNOT(2,5) — fetch +
    evict + re-fetch, all crossing device bit 2.  The cost-aware
    scheduler defers q5 (fetch penalty 0.15 * 20 outweighs its early
    score) and batches all q5 work into ONE crossing.
    """
    g = [{"qubits": [0], "gate": "H"}]
    g.append({"qubits": [5], "gate": "H"})
    g.append({"qubits": [0, 1], "gate": "CNOT"})
    g.append({"qubits": [5], "gate": "RY", "params": {"theta": 0.3}})
    g.append({"qubits": [1], "gate": "T"})
    g.append({"qubits": [5], "gate": "H"})
    for _ in range(12):
        g.append({"qubits": [1, 2], "gate": "CNOT"})
        g.append({"qubits": [2], "gate": "T"})
        g.append({"qubits": [0, 2], "gate": "CNOT"})
    g.append({"qubits": [2, 5], "gate": "CNOT"})
    g.append({"qubits": [5], "gate": "H"})
    return {"number_of_qubits": 6, "gates": g}


def test_cost_aware_staging_beats_blind_on_dcn_trap():
    cd = _dcn_trap_circuit()
    k = 3
    blind, _, _ = staging.stage_circuit(cd, k, "heuristic")
    aware, _, _ = staging.stage_circuit(cd, k, "heuristic",
                                        bit_costs=POD2_COSTS)
    c_blind = staging.plan_cost(blind, k, POD2_COSTS)
    c_aware = staging.plan_cost(aware, k, POD2_COSTS)
    assert c_aware < c_blind, (c_aware, c_blind)
    # Specifically: one DCN crossing instead of three.
    assert c_aware <= c_blind / 2


def test_choose_staging_optimizes_reported_objective():
    cd = _dcn_trap_circuit()
    k = 3
    plan, l2p, st = staging.choose_staging(cd, k, bit_costs=POD2_COSTS)
    # The portfolio's winner must be at least as cheap as every
    # single-method candidate it considered.
    for m in ("heuristic", "greedy"):
        for bc in (None, POD2_COSTS):
            alt, _, _ = staging.stage_circuit(cd, k, m, bit_costs=bc)
            assert st["plan_cost"] <= staging.plan_cost(
                alt, k, POD2_COSTS) + 1e-9
    assert st["plan_cost"] <= st["unstaged_cost"]
    # And it still computes the right state.
    got = staging.permute_state(oracle.simulate(plan), l2p)
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-10)


def test_cost_aware_schedules_remain_correct():
    rng = np.random.default_rng(11)
    for seed in range(4):
        cd = lib.random_circuit(6, 40, seed=seed)
        for costs in (POD2_COSTS, [1.0, 20.0, 20.0]):
            out, l2p, _ = staging.stage_circuit(
                cd, 3, "heuristic", bit_costs=costs)
            got = staging.permute_state(oracle.simulate(out), l2p)
            np.testing.assert_allclose(got, oracle.simulate(cd),
                                       atol=1e-10)


def test_plan_cost_charges_collapsed_reshard_volume():
    # r disjoint boundary SWAPs in a run = ONE all_to_all shipping
    # (1 - 2^-r) of the shard, priced at the dearest bit crossed.
    k, itemsize = 3, 8
    shard = (1 << k) * itemsize
    run2 = {"number_of_qubits": 6, "gates": [
        {"qubits": [0, 3], "gate": "SWAP"},
        {"qubits": [1, 5], "gate": "SWAP"},
    ]}
    got = staging.plan_cost(run2, k, POD2_COSTS, itemsize)
    assert got == 20.0 * (shard - (shard >> 2))
    # A lone ICI boundary SWAP: half a shard at weight 1.
    one = {"number_of_qubits": 6, "gates": [
        {"qubits": [0, 3], "gate": "SWAP"},
    ]}
    assert staging.plan_cost(one, k, POD2_COSTS, itemsize) == shard / 2
