"""Frozen external-anchor fingerprints (tests/data/corpus_fingerprints.json).

The frozen values were computed once by a third, independently-written
torch engine (``bench/fingerprints.py``) — the no-qiskit stand-in for
the reference's external Qiskit cross-check
(``wenbo_engine/tests/test_qiskit_oracle.py:22-30``).  CI verifies the
jax framework against the FROZEN file (not a recompute), so a shared
regression across the live engines still trips.
"""
import json
import os

import numpy as np
import pytest

from quantum_simulations_tpu.bench import fingerprints as F
from quantum_simulations_tpu.bench.corpus import CLUSTER, parse_one

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CLUSTER), reason="reference corpus absent")

FROZEN = json.load(open(F.DATA))


def test_frozen_file_complete():
    assert set(FROZEN["circuits"]) == set(F.CIRCUITS)
    for name, fp in FROZEN["circuits"].items():
        assert abs(fp["norm2"] - 1.0) < 1e-9, name
        assert len(fp["topk"]) == F.TOPK
        assert len(fp["probes"]) == F.PROBES


@pytest.mark.parametrize("name", ["qpe_n9", "adder_n10", "sat_n11",
                                  "multiply_n13", "qft_n15"])
def test_framework_matches_frozen(name):
    from quantum_simulations_tpu.runtime import simulator

    cd, _, _ = parse_one(os.path.join(CLUSTER, name, f"{name}.qasm"))
    psi = simulator.simulate_np(cd, dtype="complex128")
    err = F.verify_circuit(name, FROZEN["circuits"][name], psi)
    assert err < F.TOL, (name, err)


def test_torch_engine_is_independent_and_agrees():
    """The builder engine itself vs the numpy oracle on a fresh
    circuit (not in the frozen set) — three-way consistency."""
    from quantum_simulations_tpu.circuit import library as lib
    from quantum_simulations_tpu.oracle import dense_numpy as oracle

    cd = lib.non_stabilizer(7, depth=4)
    got = F.torch_simulate(cd)
    want = oracle.simulate(cd)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_fingerprint_detects_corruption():
    """A wrong amplitude must trip the check (anchor actually bites)."""
    fp = json.loads(json.dumps(FROZEN["circuits"]["adder_n10"]))
    from quantum_simulations_tpu.runtime import simulator

    cd, _, _ = parse_one(os.path.join(CLUSTER, "adder_n10",
                                      "adder_n10.qasm"))
    psi = simulator.simulate_np(cd, dtype="complex128")
    fp["topk"][0][1] += 1e-6
    assert F.verify_circuit("adder_n10", fp, psi) > F.TOL
