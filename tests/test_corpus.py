"""QASMBench corpus ingestion tests (fast subset).

The full per-circuit matrix (all 57 files, segment restarts at n up to
31) runs offline via ``python -m quantum_simulations_tpu.bench.corpus``
and lands in BENCH_LOCAL.json; here we pin the machinery on the small
corpus members so importer/policy/verifier regressions surface in CI.
Reference driver being matched: ``qasm_assembler_standalone.py:1768``
(execute_qasm_parts) + ``verify_compute:716``.
"""
import os

import pytest

from quantum_simulations_tpu.bench import corpus

pytestmark = pytest.mark.skipif(
    not os.path.isdir(corpus.CLUSTER), reason="reference corpus absent")


def test_discover_and_parse_all():
    """Every corpus file parses (6 of them need the trajectory tier)."""
    files = corpus.discover()
    assert len(files) == 57
    small = [(n, p) for n, p in files if os.path.getsize(p) < 200_000]
    modes = {}
    for name, path in small:
        cd, mode, err = corpus.parse_one(path)
        assert cd is not None, (name, err)
        modes[name] = mode
    assert modes["cc_n28"] == "trajectory"
    assert modes["square_root_n27"] == "trajectory"
    assert modes["qft_n26"] == "unitary"


@pytest.mark.parametrize("name", ["adder_n10", "qpe_n9", "multiply_n13"])
def test_small_circuit_verifies(name):
    path = os.path.join(corpus.CLUSTER, name, f"{name}.qasm")
    row = corpus.verify_one(name, path)
    assert row["status"] == "verified", row
    if row["method"] == "e2e_c128":
        assert row["max_amp_err"] < corpus.TOL
        assert set(row["tiers"]) >= {"pergate", "fused", "window"}


def test_classical_policy_adder_n37():
    """adder_n37 (X/CX/CCX only) runs exactly in the sparse tier at
    n=37 — beyond any dense engine — and matches the classical bit
    oracle."""
    path = os.path.join(corpus.CLUSTER, "adder_n37", "adder_n37.qasm")
    row = corpus.verify_one("adder_n37", path)
    assert row["method"] == "sparse_exact_vs_classical_oracle"
    assert row["status"] == "verified"
    assert row["n"] == 37 and row["nnz"] == 1


def test_segment_plan_scales_down_with_n():
    sg26, idx26 = corpus._seg_plan(1651, 26)
    sg30, idx30 = corpus._seg_plan(2205, 30)
    assert sg26 > sg30 and len(idx26) > len(idx30)
    assert idx26 == sorted(set(idx26))
    # k=1 picks a middle segment, not the trivial head
    sg31, idx31 = corpus._seg_plan(5700, 31)
    assert len(idx31) == 1 and idx31[0] > 0


def test_segment_verify_on_small_slice():
    """Segment-restart machinery end to end on a cheap circuit."""
    path = os.path.join(corpus.CLUSTER, "bv_n14", "bv_n14.qasm")
    cd, mode, _ = corpus.parse_one(path)
    row = corpus._verify_segments("bv_n14", cd, seg_gates=16, k=2)
    assert row["status"] == "verified"
    assert row["max_amp_err"] < corpus.TOL


def test_policy_routing():
    assert corpus._policy("x", {"number_of_qubits": 14, "gates": [
        {"qubits": [0], "gate": "H"}]}, "unitary") == "e2e"
    assert corpus._policy("x", {"number_of_qubits": 28, "gates": [
        {"qubits": [0], "gate": "H"}]}, "unitary") == "segments"
    assert corpus._policy("x", {"number_of_qubits": 33, "gates": [
        {"qubits": [0], "gate": "H"}]}, "unitary") == "parse_only"
    assert corpus._policy("x", {"number_of_qubits": 37, "gates": [
        {"qubits": [0], "gate": "X"},
        {"qubits": [0, 1], "gate": "CNOT"}]}, "unitary") == "classical"
    assert corpus._policy("x", {"number_of_qubits": 28, "gates": [
        {"qubits": [0], "gate": "RESET"}]}, "trajectory") == "trajectory"


def test_segment_disk_stream_path(monkeypatch, tmp_path):
    """The n>=31 memmap-streamed segment differential (OOM fix: at
    most one full-state array RAM-resident) — forced at tiny n."""
    monkeypatch.setenv("QST_SEG_DISK_MIN", "5")
    monkeypatch.setenv("QST_SCRATCH", str(tmp_path))
    path = os.path.join(corpus.CLUSTER, "qpe_n9", "qpe_n9.qasm")
    cd, mode, _ = corpus.parse_one(path)
    row = corpus._verify_segments("qpe_n9", cd)
    assert row["status"] == "verified", row
    assert row["max_amp_err"] < corpus.TOL
    assert not list(tmp_path.iterdir())  # scratch cleaned up
