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


def _marginal(psi, qubits, n):
    """Probability marginal over a qubit subset (little-endian value)."""
    p = np.abs(psi) ** 2
    out = np.zeros(1 << len(qubits))
    for i in range(1 << n):
        out[sum(((i >> q) & 1) << j for j, q in enumerate(qubits))] += p[i]
    return out


def test_half_adder_truth_table():
    p = np.abs(oracle.simulate(lib.half_adder())) ** 2
    for i in range(16):
        a, b, s, c = i & 1, (i >> 1) & 1, (i >> 2) & 1, (i >> 3) & 1
        want = 0.25 if (s == a ^ b and c == (a & b)) else 0.0
        assert abs(p[i] - want) < 1e-9


def test_full_adder_truth_table():
    p = np.abs(oracle.simulate(lib.full_adder())) ** 2
    for i in range(32):
        a, b, ci = i & 1, (i >> 1) & 1, (i >> 2) & 1
        s, co = (i >> 3) & 1, (i >> 4) & 1
        want = 0.125 if (s == a ^ b ^ ci
                         and co == ((a & b) ^ (a & ci) ^ (b & ci))) else 0.0
        assert abs(p[i] - want) < 1e-9


@pytest.mark.parametrize("a,b", [(5, 6), (7, 7), (0, 3)])
def test_ripple_adder_exact(a, b):
    m = 3
    psi = oracle.simulate(lib.ripple_adder(8, a_val=a, b_val=b))
    idx = int(np.argmax(np.abs(psi) ** 2))
    assert abs(np.abs(psi[idx]) - 1.0) < 1e-9
    a_out = sum(((idx >> (1 + i)) & 1) << i for i in range(m))
    b_out = sum(((idx >> (1 + m + i)) & 1) << i for i in range(m))
    cout = (idx >> (2 * m + 1)) & 1
    assert a_out == a                      # a register restored
    assert b_out == (a + b) % (1 << m)     # sum in b
    assert cout == (a + b) >> m            # carry out


@pytest.mark.parametrize("x,y", [(3, 2), (2, 3), (3, 3)])
def test_qft_multiplier_exact(x, y):
    psi = oracle.simulate(lib.qft_multiplier(8, x_val=x, y_val=y))
    idx = int(np.argmax(np.abs(psi) ** 2))
    assert abs(np.abs(psi[idx]) - 1.0) < 1e-9
    assert (idx >> 4) & 15 == (x * y) % 16


def test_amplitude_estimation_exact_peaks():
    # Default a = sin^2(5*pi/16): eigenphases +-5/16, exactly on the
    # 4-bit grid -> all mass on counting values 5 and 16-5=11.
    psi = oracle.simulate(lib.amplitude_estimation(4))
    m = _marginal(psi, [0, 1, 2, 3], 5)
    assert abs(m[5] - 0.5) < 1e-9 and abs(m[11] - 0.5) < 1e-9


def test_shor15_period_peaks():
    # a=7, N=15 has order r=4: exact peaks at s*2^m/r = {0,2,4,6}, 1/4 each.
    psi = oracle.simulate(lib.shor15(3))
    m = _marginal(psi, [0, 1, 2], 7)
    for k in (0, 2, 4, 6):
        assert abs(m[k] - 0.25) < 1e-9
    assert abs(m[1]) + abs(m[3]) + abs(m[5]) + abs(m[7]) < 1e-9


def test_quantum_walk_single_step():
    # One step from position 0: coin H then conditional +-1 shift puts
    # the walker at positions 1 and 2^m - 1 with probability 1/2 each.
    psi = oracle.simulate(lib.quantum_walk(4, steps=1))
    m = _marginal(psi, [1, 2, 3], 4)
    assert abs(m[1] - 0.5) < 1e-9 and abs(m[7] - 0.5) < 1e-9


def test_qpe_inexact_concentrates():
    # Eigenphase 1/3 on 5 bits: 32/3 = 10.67 -> the two nearest bins
    # carry >= ~85% of the mass (4/pi^2 bound per bin is ~40.5%).
    psi = oracle.simulate(lib.qpe_inexact(5))
    m = _marginal(psi, list(range(5)), 6)
    assert m[10] + m[11] > 0.8
    assert np.argmax(m) in (10, 11)


def test_qnn_norm():
    psi = oracle.simulate(lib.qnn(6))
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
    assert len(lib.FAMILIES) >= 31  # reference MQT matrix has 31 families


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
