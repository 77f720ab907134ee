"""Adaptive sparse->dense switching (v3's intermediate-sparsity play:
``v3_hisvsim_spark/tests/test_intermediate_sparsity.py``)."""
import numpy as np
import pytest

from quantum_simulations_tpu.circuit import library as lib
from quantum_simulations_tpu.oracle import dense_numpy as oracle
from quantum_simulations_tpu.sparse.adaptive import simulate_adaptive


def test_ghz_stays_sparse():
    res = simulate_adaptive(lib.ghz(40))
    assert res.switched_at is None
    assert not res.is_dense
    assert len(res.state) == 2
    assert max(res.nnz_history) == 2


def test_w_state_stays_sparse():
    res = simulate_adaptive(lib.w_state(30))
    assert res.switched_at is None
    assert len(res.state) == 30  # W state: n nonzeros


def test_hwall_switches_early_and_matches_oracle():
    cd = lib.hadamard_wall(10)
    res = simulate_adaptive(cd, dtype="complex128")
    assert res.switched_at is not None
    # H-wall densifies immediately: 2^(1/16 threshold) crossed within
    # the first ~n/2 gates
    assert res.switched_at <= 8
    assert res.is_dense
    want = oracle.simulate(cd)
    np.testing.assert_allclose(res.state, want, atol=1e-10)


def test_qft_switches_and_matches_oracle():
    cd = lib.qft(9)
    res = simulate_adaptive(cd, dtype="complex128")
    assert res.switched_at is not None
    want = oracle.simulate(cd)
    np.testing.assert_allclose(res.state, want, atol=1e-10)


def test_nnz_history_is_monotone_profile_for_ghz_qft():
    cd = lib.ghz_qft(8)
    res = simulate_adaptive(cd, dtype="complex128")
    assert len(res.nnz_history) >= 1
    want = oracle.simulate(cd)
    np.testing.assert_allclose(res.to_dense(), want, atol=1e-10)


def test_big_n_never_switches():
    """Above the dense cap the run must stay sparse regardless of nnz."""
    cd = {"number_of_qubits": 30, "gates": [
        {"gate": "H", "qubits": [q], "params": {}} for q in range(22)
    ]}
    res = simulate_adaptive(cd, dense_max_qubits=20)
    assert res.switched_at is None
    assert len(res.state) == 1 << 22


def test_api_route_auto():
    from quantum_simulations_tpu.api import simulate
    from quantum_simulations_tpu.utils.config import SimulatorConfig

    # densifying circuit -> ndarray out
    cd = lib.hadamard_wall(8)
    out = simulate(cd, SimulatorConfig(sparse="auto", dtype="complex64"))
    assert isinstance(out, np.ndarray)
    np.testing.assert_allclose(
        np.abs(out) ** 2, np.full(256, 1 / 256), atol=1e-6)

    # sparse circuit -> SparseState out
    out = simulate(lib.ghz(35), SimulatorConfig(sparse="auto"))
    assert hasattr(out, "top_amplitudes")
    assert len(out) == 2


def test_api_sample_auto_dense_route():
    from quantum_simulations_tpu.api import sample
    from quantum_simulations_tpu.utils.config import SimulatorConfig

    cd = lib.hadamard_wall(6)
    bits = sample(cd, 32, seed=0, config=SimulatorConfig(sparse="auto"))
    assert bits.shape == (32, 6)


def test_config_json_roundtrip_auto():
    from quantum_simulations_tpu.utils.config import SimulatorConfig

    cfg = SimulatorConfig(sparse="auto")
    assert SimulatorConfig.from_json(cfg.to_json()).sparse == "auto"
