"""Reshard (all_to_all bit-permutation) tests on the virtual 8-device mesh.

Parity with the reference's MPI redistributer correctness surface
(``hisvsim_repo/mpi_redistributer.hpp``): swapping local index bits
with device bits must equal the corresponding SWAP-gate sequence, for
every pair / multi-pair layout, and staged circuits must execute their
stage transitions as single collectives.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from quantum_simulations_tpu.circuit import library as lib
from quantum_simulations_tpu.circuit.fusion import GateOp, compile_steps
from quantum_simulations_tpu.circuit.staging import stage_circuit, permute_state
from quantum_simulations_tpu.oracle import dense_numpy as oracle
from quantum_simulations_tpu.parallel import executor as E
from quantum_simulations_tpu.parallel import mesh as M
from quantum_simulations_tpu.parallel import reshard
from quantum_simulations_tpu.circuit import gates as G


@pytest.fixture(scope="module")
def mesh8():
    return M.make_mesh(8)


def _random_state(n, seed):
    rng = np.random.default_rng(seed)
    psi = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    return (psi / np.linalg.norm(psi)).astype(np.complex128)


def _apply_reshard(mesh, psi, k, pairs):
    fn = shard_map(
        lambda s: reshard.swap_device_bits(s.reshape(-1), M.AXIS, k, pairs),
        mesh=mesh, in_specs=P(M.AXIS), out_specs=P(M.AXIS),
    )
    arr = jax.device_put(jnp.asarray(psi), M.state_sharding(mesh))
    return np.asarray(jax.jit(fn)(arr))


def _oracle_swaps(psi, n, pairs):
    cd = {"number_of_qubits": n,
          "gates": [{"qubits": list(p), "gate": "SWAP"} for p in pairs]}
    return oracle.simulate(cd, initial_state=psi)


PAIR_CASES = [
    [(0, 3)],
    [(2, 5)],
    [(0, 5), (1, 4)],
    [(0, 3), (1, 4), (2, 5)],
    [(2, 3), (0, 5)],
]


@pytest.mark.parametrize("pairs", PAIR_CASES,
                         ids=["-".join(f"{a}x{b}" for a, b in c)
                              for c in PAIR_CASES])
def test_swap_device_bits_vs_oracle(mesh8, pairs):
    n, k = 6, 3  # 8 devices -> device bits are qubits 3,4,5
    psi = _random_state(n, seed=hash(tuple(pairs)) % 1000)
    got = _apply_reshard(mesh8, psi, k, pairs)
    want = _oracle_swaps(psi, n, pairs)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_axis_groups_structure():
    groups = reshard._axis_groups(8, [0, 2])
    # 2 groups (bit 1 free), each of 4 members ordered by (bit0, bit2).
    assert len(groups) == 2
    for g in groups:
        assert len(g) == 4
    flat = sorted(x for g in groups for x in g)
    assert flat == list(range(8))
    # member j has bit0 = j&1, bit2 = (j>>1)&1
    for g in groups:
        for j, s in enumerate(g):
            assert (s >> 0) & 1 == (j >> 0) & 1
            assert (s >> 2) & 1 == (j >> 1) & 1


def test_plan_boundary_reshard_extracts_leading_swaps():
    k = 3
    swap = G.gate_matrix("SWAP", {})
    h = G.gate_matrix("H", {})
    ops = [
        GateOp((0, 4), swap, "SWAP"),
        GateOp((1, 3), swap, "SWAP"),
        GateOp((5,), h, "H"),
        GateOp((2, 5), swap, "SWAP"),  # after a non-SWAP: stays
    ]
    pairs, rest = reshard.plan_boundary_reshard(ops, k)
    assert pairs == [(0, 4), (1, 3)]
    assert [o.name for o in rest] == ["H", "SWAP"]


def test_plan_boundary_reshard_rejects_overlap_and_local():
    k = 3
    swap = G.gate_matrix("SWAP", {})
    # Overlapping device bit: second SWAP must not join the reshard.
    ops = [GateOp((0, 4), swap, "SWAP"), GateOp((1, 4), swap, "SWAP")]
    pairs, rest = reshard.plan_boundary_reshard(ops, k)
    assert pairs == [(0, 4)] and len(rest) == 1
    # All-local SWAP is not a boundary transition.
    pairs, rest = reshard.plan_boundary_reshard(
        [GateOp((0, 1), swap, "SWAP")], k)
    assert pairs == [] and len(rest) == 1


def test_staged_circuit_stage_transitions_collapse(mesh8):
    """A staged deep circuit runs its boundary SWAPs as reshards and
    still matches the oracle end to end."""
    n = 6
    cd = lib.qft(n)
    staged, log2phys, st = stage_circuit(cd, k=3, method="heuristic")
    got = E.collect_state(E.simulate_sharded(mesh8, staged, dtype="complex128"))
    got = permute_state(got, log2phys)
    want = oracle.simulate(cd)
    np.testing.assert_allclose(got, want, atol=1e-10)
    # The compiled steps must expose reshard-able boundary SWAP runs.
    steps = compile_steps(staged, k=3)
    reshard_rounds = 0
    residual_swaps = 0
    for s in steps:
        pairs, rest = reshard.plan_boundary_reshard(s.nonlocal_ops, 3)
        if pairs:
            reshard_rounds += 1
        residual_swaps += sum(1 for o in rest if o.name == "SWAP")
    assert reshard_rounds >= 1
    # Every staged boundary SWAP rides a reshard, none fall through.
    assert residual_swaps == 0


def test_reshard_bytes_model():
    b = reshard.reshard_bytes(k=20, r=3)
    shard = (1 << 20) * 8
    assert b["ppermute_chain_bytes"] == 3 * shard
    assert b["all_to_all_bytes"] == shard - shard // 8


# ---------------------------------------------------------------------------
# Fuzz: random disjoint pair sets x mesh sizes vs the SWAP-chain oracle
# (regression class of the round-2 cross-phase panel-ordering race)
# ---------------------------------------------------------------------------

def test_swap_device_bits_fuzz_random_pairs():
    rng = np.random.default_rng(123)
    for trial in range(40):
        d = int(rng.choice([1, 2, 3]))
        mesh = M.make_mesh(1 << d)
        k = int(rng.integers(2, 5))
        n = d + k
        r = int(rng.integers(1, min(k, d) + 1))
        lqs = rng.choice(k, size=r, replace=False)
        dqs = rng.choice(np.arange(k, n), size=r, replace=False)
        pairs = [(int(a), int(b)) for a, b in zip(lqs, dqs)]
        psi = _random_state(n, seed=1000 + trial)
        got = _apply_reshard(mesh, psi, k, pairs)
        want = _oracle_swaps(psi, n, pairs)
        np.testing.assert_allclose(
            got, want, atol=1e-12,
            err_msg=f"trial={trial} d={d} n={n} pairs={pairs}")


def test_swap_device_bits_fuzz_composed_with_gates(mesh8):
    """Reshard sandwiched between gate layers: layout bookkeeping must
    compose (the reshard is not just a standalone permutation)."""
    rng = np.random.default_rng(7)
    n, k = 6, 3
    for trial in range(10):
        r = int(rng.integers(1, 4))
        lqs = rng.choice(k, size=r, replace=False)
        dqs = rng.choice(np.arange(k, n), size=r, replace=False)
        pairs = [(int(a), int(b)) for a, b in zip(lqs, dqs)]
        pre = lib.random_circuit(n, 10, seed=trial)
        post = lib.random_circuit(n, 10, seed=100 + trial)

        def run(s):
            s = s.reshape(-1)
            for g in pre["gates"]:
                U = G.gate_matrix(g["gate"], g.get("params") or {})
                qs = tuple(g["qubits"])
                if all(q < k for q in qs):
                    from quantum_simulations_tpu.ops import dense
                    s = dense.apply_gate(s, qs, U)
                else:
                    from quantum_simulations_tpu.ops import exchange
                    s = exchange.apply_nonlocal(s, M.AXIS, k, qs, U)
            return reshard.swap_device_bits(s, M.AXIS, k, pairs)

        psi = _random_state(n, seed=trial)
        arr = jax.device_put(jnp.asarray(psi), M.state_sharding(mesh8))
        fn = shard_map(run, mesh=mesh8, in_specs=P(M.AXIS),
                       out_specs=P(M.AXIS))
        got = np.asarray(jax.jit(fn)(arr))
        mid = oracle.simulate(pre, initial_state=psi)
        want = _oracle_swaps(mid, n, pairs)
        np.testing.assert_allclose(got, want, atol=1e-12,
                                   err_msg=f"trial={trial} pairs={pairs}")


def test_apply_nonlocal_fuzz_random_2q_unitaries(mesh8):
    """exchange.apply_nonlocal vs oracle for Haar-random and structured
    2q gates in EVERY boundary split — including the asymmetric
    single-cell case (SWAP) that the reshard hoist normally hides."""
    from scipy.stats import unitary_group

    n, k = 6, 3
    rng = np.random.default_rng(42)
    mats = [G.SWAP(), G.CNOT(), G.CY()]
    mats += [unitary_group.rvs(4, random_state=7 + i) for i in range(3)]
    splits = [(0, 4), (4, 0), (2, 3), (3, 2), (1, 5), (3, 4), (5, 3)]
    for U in mats:
        for qs in splits:
            def run(s, U=U, qs=qs):
                from quantum_simulations_tpu.ops import exchange
                return exchange.apply_nonlocal(
                    s.reshape(-1), M.AXIS, k, qs, U)

            psi = _random_state(n, seed=int(rng.integers(1 << 30)))
            arr = jax.device_put(jnp.asarray(psi), M.state_sharding(mesh8))
            fn = shard_map(run, mesh=mesh8, in_specs=P(M.AXIS),
                           out_specs=P(M.AXIS))
            got = np.asarray(jax.jit(fn)(arr))
            want = oracle.apply_gate(psi, list(qs), np.asarray(U))
            np.testing.assert_allclose(
                got, want, atol=1e-12,
                err_msg=f"qs={qs} U={np.asarray(U)[:1]}")
