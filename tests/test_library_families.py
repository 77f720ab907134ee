"""Analytic checks for the extended circuit-family library.

Reference analogue: the MQT-Bench family matrix
(``wenbo_engine/bench/mqt_bench_runner.py:28-105``) — each family here
has a closed-form output property checked against the numpy oracle.
"""
import numpy as np
import pytest

from quantum_simulations_tpu.circuit import library as lib
from quantum_simulations_tpu.oracle import dense_numpy as oracle


def test_bv_recovers_secret():
    n, secret = 7, 0b10110
    psi = oracle.simulate(lib.bernstein_vazirani(n, secret))
    p = np.abs(psi) ** 2
    data = np.argmax([p[i] + p[i | (1 << (n - 1))]
                      for i in range(1 << (n - 1))])
    assert data == secret


def test_dj_balanced_hits_all_ones():
    n = 6
    psi = oracle.simulate(lib.deutsch_jozsa(n))
    p = np.abs(psi) ** 2
    mask = (1 << (n - 1)) - 1
    probs = np.zeros(1 << (n - 1))
    for i in range(1 << n):
        probs[i & mask] += p[i]
    assert np.argmax(probs) == mask and probs[mask] > 1 - 1e-9


def test_dj_constant_hits_zero():
    psi = oracle.simulate(lib.deutsch_jozsa(6, balanced=False))
    p = np.abs(psi) ** 2
    assert p[0] + p[1 << 5] > 1 - 1e-9


@pytest.mark.parametrize("n,add", [(6, 0b1011), (5, 7), (4, 15)])
def test_qft_adder_exact(n, add):
    psi = oracle.simulate(lib.qft_adder(n, add))
    assert np.argmax(np.abs(psi) ** 2) == add
    assert abs(np.abs(psi[add]) - 1.0) < 1e-9


@pytest.mark.parametrize("n", [6, 8])
def test_hidden_shift_exact(n):
    psi = oracle.simulate(lib.hidden_shift(n))
    pk = int(np.argmax(np.abs(psi) ** 2))
    assert pk == 0b0110 and abs(np.abs(psi[pk]) - 1.0) < 1e-9


@pytest.mark.parametrize("n", [2, 3, 6])
def test_grover_amplifies_marked(n):
    psi = oracle.simulate(lib.grover(n))
    p = np.abs(psi) ** 2
    if n <= 3:
        marked = p[(1 << n) - 1]
    else:
        marked = sum(p[i] for i in range(1 << n) if (i >> (n - 3)) == 7)
    assert marked > 3 * 2.0 ** -min(n, 3)


@pytest.mark.parametrize("fam", ["graph_state", "trotter_ising", "vqe", "su2", "two_local", "portfolio_qaoa"])
def test_parametric_families_norm(fam):
    psi = oracle.simulate(lib.FAMILIES[fam](8))
    assert abs(np.linalg.norm(psi) - 1.0) < 1e-9


def test_family_registry_complete():
    """Every family builds a valid circuit at n=8 and n=11."""
    from quantum_simulations_tpu.circuit.contract import (
        validate_circuit_dict,
    )

    for fam, build in lib.FAMILIES.items():
        for n in (8, 11):
            cd = build(n)
            validate_circuit_dict(cd)
    assert len(lib.FAMILIES) >= 22


def test_w_qft_norm_and_structure():
    cd = lib.w_qft(5)
    psi = oracle.simulate(cd)
    np.testing.assert_allclose(np.vdot(psi, psi).real, 1.0, atol=1e-10)
    # The W part leaves exactly n nonzeros before the QFT spreads them.
    w_only = oracle.simulate(lib.w_state(5))
    assert np.count_nonzero(np.abs(w_only) > 1e-12) == 5


def test_ghz_proned_depth_truncation():
    cd = lib.ghz_proned(4, 10)
    assert len(cd["gates"]) == 10
    psi = oracle.simulate(cd)
    np.testing.assert_allclose(np.vdot(psi, psi).real, 1.0, atol=1e-10)
    # Second pass must act on the flipped ladder (qubit n-1 leads).
    assert cd["gates"][4]["qubits"] == [3]
