"""Staging scheduler vs HiSVSIM's precomputed partition files.

Full sweep runs offline (``bench/hisvsim_parts.py`` -> BENCH_LOCAL);
here the cheap circuits pin the parser (pseudo-node filtering, gate
mapping) and the ≥-parity property.  Reference partitioner:
``v3_hisvsim_spark/src/hisvsim/partition_adapter.py:34-180``.
"""
import os

import pytest

from quantum_simulations_tpu.bench import hisvsim_parts as H
from quantum_simulations_tpu.bench.corpus import CLUSTER, parse_one

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CLUSTER), reason="reference corpus absent")


def test_discovers_all_partition_files():
    files = H.partition_files()
    assert len(files) == 14
    assert {s for _n, s, _p in files} == {"smart", "dfs", "nat"}


def test_load_partition_maps_every_gate():
    cd, _, _ = parse_one(os.path.join(CLUSTER, "bv_n19", "bv_n19.qasm"))
    parts = H.load_partition(
        os.path.join(CLUSTER, "bv_n19", "bv_n19_part_smart"), cd["gates"])
    assert parts is not None and len(parts) == len(cd["gates"]) == 56
    assert set(parts) == {0, 1}


def test_sequencing_is_dependency_valid():
    cd, _, _ = parse_one(os.path.join(CLUSTER, "bv_n19", "bv_n19.qasm"))
    parts = H.load_partition(
        os.path.join(CLUSTER, "bv_n19", "bv_n19_part_smart"), cd["gates"])
    seq = H.sequence_partitions(cd["gates"], parts)
    assert seq is not None and len(seq) == len(cd["gates"])
    # multiset of gates preserved
    key = lambda g: (g["gate"], tuple(g["qubits"]))
    assert sorted(map(key, seq)) == sorted(map(key, cd["gates"]))


def test_bench_local_sweep_frozen_and_loss_free():
    """The published sweep (all 14 partition files x d in {3,4}) is
    frozen in BENCH_LOCAL `hisvsim_parts`; regression-guard the
    headline: every row present, zero losses, wins on every qft row."""
    import json

    p = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_LOCAL.json")
    d = json.load(open(p))
    sweep = d.get("hisvsim_parts")
    assert sweep is not None, "hisvsim_parts sweep missing from BENCH_LOCAL"
    rows = [r for r in sweep["rows"] if "verdict" in r]
    assert len(rows) == 28  # 14 partition files x devices {8, 16}
    assert sweep["losses"] == 0
    assert sweep["wins"] + sweep["parity"] == 28
    for r in rows:
        assert r["verdict"] in ("win", "parity"), r
        assert r["our_stages"] <= r["their_stages"], r
        if r["circuit"].startswith("qft"):
            assert r["verdict"] == "win", r


def test_scheduler_at_least_parity_on_bv19():
    from quantum_simulations_tpu.circuit import staging as S

    cd, _, _ = parse_one(os.path.join(CLUSTER, "bv_n19", "bv_n19.qasm"))
    parts = H.load_partition(
        os.path.join(CLUSTER, "bv_n19", "bv_n19_part_smart"), cd["gates"])
    seq = H.sequence_partitions(cd["gates"], parts)
    k = cd["number_of_qubits"] - 3
    theirs = H.score(cd, seq, k)
    _, _, ours = S.stage_circuit(cd, k, "heuristic")
    assert ours["stages"] <= theirs["stages"]
