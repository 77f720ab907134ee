"""High-level API, CLI, and circuit-DAG tests."""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from quantum_simulations_tpu import api
from quantum_simulations_tpu.circuit import library as lib
from quantum_simulations_tpu.circuit.dag import (
    CircuitGraph, partition, partition_stats,
)
from quantum_simulations_tpu.oracle import dense_numpy as oracle
from quantum_simulations_tpu.utils.config import SimulatorConfig

REPO = Path(__file__).resolve().parent.parent


# ---------------------------------------------------------------------------
# API facade
# ---------------------------------------------------------------------------

def test_api_dense_modes():
    cd = lib.qft(6)
    want = oracle.simulate(cd)
    for mode in ("fused", "panel"):
        got = api.simulate(cd, SimulatorConfig(dtype="complex128", mode=mode))
        np.testing.assert_allclose(got, want, atol=1e-10)


def test_api_sharded():
    cd = lib.ghz(7)
    got = api.simulate(cd, SimulatorConfig(dtype="complex128", n_devices=4))
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-10)


def test_api_spill():
    cd = lib.qft(6)
    got = api.simulate(cd, SimulatorConfig(dtype="complex128", stripe_qubits=3))
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-10)


def test_api_sparse():
    st = api.simulate(lib.ghz(40), SimulatorConfig(sparse=True))
    assert len(st) == 2


def test_api_workdir(tmp_path):
    cd = lib.ghz(5)
    got = api.simulate(cd, SimulatorConfig(dtype="complex128"),
                       work_dir=tmp_path)
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-10)
    assert (tmp_path / "wal.json").exists()


def test_api_sample_and_expectation():
    bits = api.sample(lib.bell(), shots=200, seed=1,
                      config=SimulatorConfig(dtype="complex128"))
    assert bits.shape == (200, 2)
    assert set(map(tuple, bits.tolist())) <= {(0, 0), (1, 1)}
    ez = api.expectation_z(lib.ghz(3), [0, 1],
                           config=SimulatorConfig(dtype="complex128"))
    assert abs(ez - 1.0) < 1e-6


# ---------------------------------------------------------------------------
# CLI (subprocess; CPU platform)
# ---------------------------------------------------------------------------

def _cli(tmp_path, *args):
    env = {"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin",
           "JAX_PLATFORMS": "cpu", "HOME": str(tmp_path)}
    return subprocess.run(
        [sys.executable, "-m", "quantum_simulations_tpu", *args],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
    )


def test_cli_run_and_stats(tmp_path):
    circ = tmp_path / "bell.json"
    circ.write_text(json.dumps(lib.bell()))
    res = _cli(tmp_path, "run", str(circ), "--dtype", "complex64")
    assert res.returncode == 0, res.stderr
    out = json.loads(res.stdout)
    assert abs(out["norm2"] - 1.0) < 1e-5
    assert {t[0] for t in out["top"][:2]} == {"0x0", "0x3"}

    res = _cli(tmp_path, "stats", str(circ))
    assert res.returncode == 0, res.stderr
    st = json.loads(res.stdout)
    assert st["n_gates"] == 2 and st["depth"] == 2


def test_cli_qasm_and_sample(tmp_path):
    qasm = tmp_path / "bell.qasm"
    qasm.write_text("OPENQASM 2.0; qreg q[2]; h q[0]; cx q[0],q[1];")
    res = _cli(tmp_path, "sample", str(qasm), "--shots", "20")
    assert res.returncode == 0, res.stderr
    lines = res.stdout.split()
    assert len(lines) == 20 and set(lines) <= {"00", "11"}


def test_cli_sparse(tmp_path):
    circ = tmp_path / "ghz.json"
    circ.write_text(json.dumps(lib.ghz(30)))
    res = _cli(tmp_path, "run", str(circ), "--sparse")
    assert res.returncode == 0, res.stderr
    out = json.loads(res.stdout)
    assert out["nonzero"] == 2


# ---------------------------------------------------------------------------
# DAG + partitioning
# ---------------------------------------------------------------------------

def test_dag_structure():
    g = CircuitGraph.from_circuit(lib.ghz(4))
    assert g.is_acyclic()
    levels = g.topological_levels()
    assert len(levels) == 4  # H, CNOT chain of 3
    assert g.critical_path_length() == 4


def test_dag_independent_gates_same_level():
    cd = {"number_of_qubits": 4, "gates": [
        {"qubits": [0], "gate": "H"},
        {"qubits": [1], "gate": "H"},
        {"qubits": [0, 1], "gate": "CNOT"},
        {"qubits": [2, 3], "gate": "CNOT"},
    ]}
    levels = CircuitGraph.from_circuit(cd).topological_levels()
    assert levels[0] == [0, 1, 3]
    assert levels[1] == [2]


@pytest.mark.parametrize("strategy",
                         ["level_based", "greedy", "balanced", "locality"])
def test_partition_strategies(strategy):
    cd = lib.random_circuit(6, 40, seed=4)
    parts = partition(cd, 4, strategy)
    flat = sorted(g for p in parts for g in p)
    assert flat == list(range(40))  # every gate exactly once
    stats = partition_stats(cd, parts)
    assert stats["total_edges"] > 0


def test_partition_respects_order_within():
    cd = lib.qft(5)
    for strategy in ("greedy", "level_based"):
        parts = partition(cd, 3, strategy)
        seen = -1
        for p in parts:
            for g in sorted(p):
                assert g > seen or strategy == "level_based"
        # executing partitions in order must reproduce the circuit
        order = [g for p in parts for g in sorted(p)]
        if strategy == "greedy":
            assert order == list(range(len(cd["gates"])))


def test_segmented_compilation_matches_oracle():
    # segment_gates wires dag.partition(strategy="locality") into the
    # execution path: a deep circuit compiles as several bounded
    # programs whose composition must equal the monolithic result.
    cd = lib.random_circuit(8, 60, seed=11)
    ref = oracle.simulate(cd)
    got = api.simulate(cd, SimulatorConfig(segment_gates=12))
    np.testing.assert_allclose(got, ref.astype(np.complex64), atol=1e-5)


def test_segmented_window_mode_matches_oracle():
    cd = lib.qft(10)
    ref = oracle.simulate(cd)
    got = api.simulate(
        cd, SimulatorConfig(mode="window", segment_gates=10))
    phase = ref.conj() @ got.astype(np.complex128)
    assert abs(abs(phase) - 1.0) < 1e-5


def test_segmented_noop_when_shallow():
    cd = lib.ghz(5)
    got = api.simulate(cd, SimulatorConfig(segment_gates=100))
    ref = oracle.simulate(cd)
    np.testing.assert_allclose(got, ref.astype(np.complex64), atol=1e-6)


def test_cli_step_levels_cadence(tmp_path):
    """--step-levels/--checkpoint-every reach the WAL runner: a deep
    all-local circuit commits at a real cadence, not once at the end."""
    circ = tmp_path / "qft6.json"
    circ.write_text(json.dumps(lib.qft(6)))
    wd = tmp_path / "wd"
    res = _cli(tmp_path, "run", str(circ), "--work-dir", str(wd),
               "--step-levels", "1", "--checkpoint-every", "3")
    assert res.returncode == 0, res.stderr
    wal = json.loads((wd / "wal.json").read_text())
    assert wal["done_steps"] > 4  # one step per level, not one total
    evs = [json.loads(l) for l in (wd / "events.jsonl").read_text().splitlines()]
    commits = [e["step"] for e in evs if e["kind"] == "step_commit"]
    assert len(commits) >= 3  # cadence-3 commits plus the final one
