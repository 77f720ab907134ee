"""Ensemble-statistics validation of the trajectory tier.

The seeded oracle twin (tests/test_trajectory.py) consumes the SAME
uniform stream as the engine, so twin-match cannot catch a *shared*
misreading of measurement semantics (e.g. both sides computing 1-P,
or both collapsing to the wrong branch).  These tests close that gap:
O(1000) seeded trajectories per circuit, outcome frequencies asserted
against ANALYTIC probabilities within 4.5-sigma binomial bounds, plus
exact correlation identities (Bell: outcomes always equal;
classically-conditioned X: target outcome equals control outcome).

Reference measurement semantics analogue:
``hisvsim_repo/state_vector.hpp:829-897`` (measure/prob/project) —
which the reference never exercises on its corpus because its QASM
driver drops ``reset`` (qasm_assembler_standalone.py:525).
"""
import math

import jax
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")

from quantum_simulations_tpu.runtime.trajectory import simulate_trajectory


def _meas(q, creg="c", cbit=0, **kw):
    return {"qubits": [q], "gate": "MEASURE",
            "params": {"creg": creg, "cbit": cbit}, **kw}


def _freq_bound(p: float, n: int, sigmas: float = 4.5) -> float:
    return sigmas * math.sqrt(p * (1 - p) / n)


def _run_many(cd, n_traj):
    return [simulate_trajectory(cd, seed=s) for s in range(n_traj)]


def test_h_measure_frequency():
    """H |0> then measure: P(1) = 1/2 exactly; 3000-trajectory
    frequency must land inside the 4.5-sigma binomial band."""
    N = 3000
    cd = {"number_of_qubits": 1,
          "gates": [{"qubits": [0], "gate": "H"}, _meas(0)]}
    outs = [t[2][0] for t in _run_many(cd, N)]
    f = sum(outs) / N
    assert abs(f - 0.5) < _freq_bound(0.5, N), f


def test_ry_asymmetric_frequency():
    """RY(theta)|0> then measure: P(1) = sin^2(theta/2) -- an
    ASYMMETRIC probability, so a p <-> 1-p swap in either the draw
    comparison or the collapse branch cannot cancel out."""
    N = 3000
    theta = 2 * math.pi / 5
    p1 = math.sin(theta / 2) ** 2  # ~0.3455
    cd = {"number_of_qubits": 1,
          "gates": [{"qubits": [0], "gate": "RY",
                     "params": {"theta": theta}}, _meas(0)]}
    outs = [t[2][0] for t in _run_many(cd, N)]
    f = sum(outs) / N
    assert abs(f - p1) < _freq_bound(p1, N), (f, p1)


def test_bell_measure_correlation():
    """Bell pair, measure both qubits: outcomes are ALWAYS equal
    (exact correlation, every trajectory), and the shared marginal is
    1/2 within binomial bounds."""
    N = 1500
    cd = {"number_of_qubits": 2,
          "gates": [{"qubits": [0], "gate": "H"},
                    {"qubits": [0, 1], "gate": "CNOT"},
                    _meas(0, cbit=0), _meas(1, cbit=1)]}
    trajs = _run_many(cd, N)
    for _psi, cregs, outs in trajs:
        assert outs[0] == outs[1], "Bell outcomes must be equal"
        assert cregs["c"] == (3 if outs[0] else 0)
    f = sum(t[2][0] for t in trajs) / N
    assert abs(f - 0.5) < _freq_bound(0.5, N), f


def test_conditioned_x_tracks_control():
    """Measure q0 after H; X on q1 conditioned on c==1; measure q1:
    q1's outcome must equal q0's in EVERY trajectory (classical
    feed-forward correctness), marginal 1/2."""
    N = 1500
    cd = {"number_of_qubits": 2,
          "gates": [{"qubits": [0], "gate": "H"},
                    _meas(0, cbit=0),
                    {"qubits": [1], "gate": "X",
                     "cond": {"creg": "c", "value": 1}},
                    _meas(1, cbit=1)]}
    trajs = _run_many(cd, N)
    for _psi, _cregs, outs in trajs:
        assert outs[1] == outs[0]
    f = sum(t[2][0] for t in trajs) / N
    assert abs(f - 0.5) < _freq_bound(0.5, N), f


def test_reset_reuse_independence():
    """H-measure, then RESET and H-measure again on the SAME qubit:
    the second outcome is a fresh fair coin independent of the first
    (reset really returns the wire to |0>).  Checks both second-shot
    frequency and the 2x2 joint table against independence."""
    N = 3000
    cd = {"number_of_qubits": 1,
          "gates": [{"qubits": [0], "gate": "H"}, _meas(0, cbit=0),
                    {"qubits": [0], "gate": "RESET"},
                    {"qubits": [0], "gate": "H"}, _meas(0, cbit=1)]}
    trajs = _run_many(cd, N)
    # outcomes = [measure0, reset-branch, measure1]: RESET records its
    # internal collapse draw too, and on the already-collapsed wire it
    # must equal the preceding measurement in EVERY trajectory.
    first = np.array([t[2][0] for t in trajs])
    resets = np.array([t[2][1] for t in trajs])
    np.testing.assert_array_equal(resets, first)
    second = np.array([t[2][2] for t in trajs])
    f2 = second.mean()
    assert abs(f2 - 0.5) < _freq_bound(0.5, N), f2
    # conditional second-shot frequencies: independent of the first
    for b in (0, 1):
        sel = second[first == b]
        assert len(sel) > 0
        assert abs(sel.mean() - 0.5) < _freq_bound(0.5, len(sel)), (
            b, sel.mean(), len(sel))


def test_reset_without_measure_is_deterministic():
    """RESET on a superposed qubit then X: final state must be exactly
    |1> in every trajectory branch taken -- and P(collapse branch)
    respects the amplitude split (frequency of the internal draw shows
    through the returned outcome only via the collapse; verify the
    post-state is pure |1> regardless of seed)."""
    cd = {"number_of_qubits": 1,
          "gates": [{"qubits": [0], "gate": "H"},
                    {"qubits": [0], "gate": "RESET"},
                    {"qubits": [0], "gate": "X"}]}
    for seed in range(32):
        psi, _cregs, _outs = simulate_trajectory(cd, seed=seed)
        got = np.asarray(psi)
        np.testing.assert_allclose(np.abs(got), [0.0, 1.0], atol=1e-6)
