"""Rotating-panel compiler tests."""
import numpy as np
import pytest

from quantum_simulations_tpu.circuit import library as lib
from quantum_simulations_tpu.circuit.panelize import (
    PanelOp, RotateOp, PhysGateOp, compile_panel_schedule, panel_stats,
)
from quantum_simulations_tpu.oracle import dense_numpy as oracle
from quantum_simulations_tpu.ops import dense
from quantum_simulations_tpu.runtime import simulator


def test_rotate_bits_right_index_algebra():
    import jax.numpy as jnp
    n = 6
    psi = np.arange(1 << n).astype(np.complex128)
    for r in (1, 3, 5):
        out = np.asarray(dense.rotate_bits_right(jnp.asarray(psi), r))
        for i_new in range(1 << n):
            # new bit j = old bit (j + r) mod n
            i_old = 0
            for j in range(n):
                if (i_new >> j) & 1:
                    i_old |= 1 << ((j + r) % n)
            assert out[i_new] == psi[i_old]


def test_rotation_roundtrip():
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    psi = jnp.asarray(rng.normal(size=1 << 9) + 0j)
    out = dense.rotate_bits_right(dense.rotate_bits_right(psi, 7), 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(psi), atol=0)


CIRCUITS = [
    ("nonstab", lib.non_stabilizer(11, depth=3)),
    ("qft10", lib.qft(10)),
    ("sycamore", lib.sycamore_like(10, depth=5)),
    ("random", lib.random_circuit(10, 80, seed=2)),
    ("ghz12", lib.ghz(12)),
    ("w9", lib.w_state(9)),
    ("qaoa", lib.qaoa_maxcut(10, p=2)),
    ("qpe", lib.qpe(6)),
]


@pytest.mark.parametrize("tag,cd", CIRCUITS, ids=[c[0] for c in CIRCUITS])
def test_panel_mode_vs_oracle(tag, cd):
    got = np.asarray(simulator.simulate(cd, dtype="complex128", mode="panel"))
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-10)


def test_panel_pass_compression():
    cd = lib.non_stabilizer(12, depth=3)
    st = panel_stats(cd)
    # 70+ gates must compress to far fewer HBM passes than gates.
    assert st["hbm_passes"] < st["gates"] / 5


def test_small_circuit_single_panel():
    ops, shift = compile_panel_schedule(lib.qft(5))
    assert len(ops) == 1 and isinstance(ops[0], PanelOp)
    assert shift == 0


def test_far_pair_gates_go_generic():
    # CNOT(0, 10) at n=20: cyclic distance 10 >= 7 -> generic path.
    cd = {"number_of_qubits": 20, "gates": [
        {"qubits": [0], "gate": "H"},
        {"qubits": [0, 10], "gate": "CNOT"},
    ]}
    ops, _ = compile_panel_schedule(cd)
    assert any(isinstance(o, PhysGateOp) for o in ops)
    got = np.asarray(simulator.simulate(cd, dtype="complex128", mode="panel"))
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-12)


def test_window_straddling_pair():
    # Pair (6,7) straddles the lane boundary at every 7-step residue;
    # the scheduler must insert a corrective rotation, not stall.
    cd = {"number_of_qubits": 14, "gates": [
        {"qubits": [6], "gate": "H"},
        {"qubits": [6, 7], "gate": "CNOT"},
        {"qubits": [13, 1], "gate": "CNOT"},
    ]}
    got = np.asarray(simulator.simulate(cd, dtype="complex128", mode="panel"))
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-12)


def test_empty_circuit_panel():
    ops, shift = compile_panel_schedule({"number_of_qubits": 4, "gates": []})
    assert ops == [] and shift == 0


def test_multiswap_merge_and_semantics():
    """Consecutive disjoint high SWAPs fuse into one MultiSwapOp whose
    transpose matches per-gate application (QFT's bit-reversal)."""
    import jax.numpy as jnp
    from quantum_simulations_tpu.circuit.panelize import (
        MultiSwapOp, PhysGateOp, _merge_swap_runs,
    )
    from quantum_simulations_tpu.circuit import gates as G
    from quantum_simulations_tpu.oracle import dense_numpy as oracle
    from quantum_simulations_tpu.runtime.simulator import (
        apply_multiswap_planar,
    )
    from quantum_simulations_tpu.ops.pallas_kernels import (
        from_planar, to_planar,
    )

    ops = [
        PhysGateOp((15, 7), G.SWAP(), "SWAP"),
        PhysGateOp((14, 8), G.SWAP(), "SWAP"),
        PhysGateOp((13, 9), G.SWAP(), "SWAP"),
    ]
    merged = _merge_swap_runs(list(ops))
    assert len(merged) == 1 and isinstance(merged[0], MultiSwapOp)
    assert len(merged[0].pairs) == 3

    # overlapping bits break the run
    clash = _merge_swap_runs([
        PhysGateOp((15, 7), G.SWAP(), "SWAP"),
        PhysGateOp((15, 8), G.SWAP(), "SWAP"),
    ])
    assert len(clash) == 2

    # low-bit SWAPs never merge (trailing dim must keep full lanes)
    lowswap = _merge_swap_runs([
        PhysGateOp((15, 3), G.SWAP(), "SWAP"),
        PhysGateOp((14, 8), G.SWAP(), "SWAP"),
    ])
    assert all(isinstance(o, PhysGateOp) for o in lowswap)

    n = 16
    rng = np.random.default_rng(5)
    psi = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    psi = (psi / np.linalg.norm(psi)).astype(np.complex64)
    re, im = to_planar(jnp.asarray(psi))
    re, im = apply_multiswap_planar(re, im, merged[0].pairs)
    got = np.asarray(from_planar(re, im))
    want = psi.astype(np.complex128)
    for qs in [(15, 7), (14, 8), (13, 9)]:
        want = oracle.apply_gate(want, list(qs), G.SWAP())
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_layout_safe_schedule_stays_compact():
    """Capacity merge classes must keep QFT pass counts near the free
    partition (the singleton-mixed regression was 160 ops at n=30)."""
    from quantum_simulations_tpu.circuit import library as lib
    from quantum_simulations_tpu.circuit.panelize import (
        compile_window_schedule,
    )

    for n in (17, 24):
        cd = lib.qft(n)
        free = compile_window_schedule(cd)
        safe = compile_window_schedule(cd, layout_safe_diag=True)
        assert len(safe) <= 2 * len(free) + 8, (n, len(free), len(safe))
