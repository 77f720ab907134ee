"""Fixed-window planar-Pallas execution mode tests (interpret on CPU)."""
import numpy as np
import pytest

from quantum_simulations_tpu.circuit import library as lib
from quantum_simulations_tpu.circuit.panelize import (
    WindowPanelOp, _fit_start, compile_window_schedule, window_stats,
)
from quantum_simulations_tpu.oracle import dense_numpy as oracle
from quantum_simulations_tpu.runtime import simulator


def test_fit_start_rules():
    n, w = 28, 7
    assert _fit_start([0, 3], n, w) == 0
    assert _fit_start([6], n, w) == 0
    assert _fit_start([7, 9], n, w) == 7
    assert _fit_start([13, 14], n, w) is not None  # 13..14 fits s=8..13
    assert _fit_start([6, 7], n, w) is None        # straddles start gap
    assert _fit_start([0, 10], n, w) is None       # span >= 7
    assert _fit_start([26, 27], n, w) == 21
    # Ragged top window at small n.
    assert _fit_start([8, 11], 12, w) == 7


CIRCUITS = [
    ("nonstab12", lib.non_stabilizer(12, depth=3)),
    ("qft10", lib.qft(10)),
    ("sycamore14", lib.sycamore_like(14, depth=4)),
    ("random10", lib.random_circuit(10, 80, seed=2)),
    ("ghz14", lib.ghz(14)),
    ("qaoa10", lib.qaoa_maxcut(10, p=2)),
    ("w9", lib.w_state(9)),
    ("qpe7", lib.qpe(6)),
]


@pytest.mark.parametrize("tag,cd", CIRCUITS, ids=[c[0] for c in CIRCUITS])
def test_window_mode_vs_oracle(tag, cd):
    got = np.asarray(simulator.simulate(cd, dtype="complex128", mode="window"))
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-10)


def test_window_mode_c64():
    cd = lib.non_stabilizer(12, depth=3)
    got = np.asarray(simulator.simulate(cd, dtype="complex64", mode="window"))
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=2e-5)


def test_window_pass_compression():
    st = window_stats(lib.non_stabilizer(16, depth=2))
    assert st["hbm_passes"] <= st["gates"] / 8


def test_schedule_ordering_across_buckets():
    """Dependent gates landing in different windows must keep order."""
    cd = {"number_of_qubits": 21, "gates": [
        {"qubits": [13, 14], "gate": "CNOT"},   # window s=8..13
        {"qubits": [9, 13], "gate": "CNOT"},    # window s=7..9, AFTER above
        {"qubits": [13], "gate": "H"},
        {"qubits": [14, 20], "gate": "CNOT"},   # window s=14
    ]}
    got = np.asarray(simulator.simulate(cd, dtype="complex128", mode="window"))
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-12)


def test_all_panel_ops_valid_positions():
    for cd in (lib.non_stabilizer(18, depth=2), lib.sycamore_like(15, depth=3)):
        for op in compile_window_schedule(cd):
            if isinstance(op, WindowPanelOp):
                assert op.pos == 0 or op.pos >= 7
                dim = op.W.shape[0]
                assert op.pos + dim.bit_length() - 1 <= cd["number_of_qubits"]
