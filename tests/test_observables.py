"""Pauli-string observables vs a dense-operator oracle."""
import numpy as np
import pytest

from quantum_simulations_tpu import api
from quantum_simulations_tpu.circuit import library as lib
from quantum_simulations_tpu.oracle import dense_numpy as oracle

jnp = pytest.importorskip("jax.numpy")
from quantum_simulations_tpu.ops import observables  # noqa: E402

_P = {
    "I": np.eye(2), "X": np.array([[0, 1], [1, 0]], dtype=complex),
    "Y": np.array([[0, -1j], [1j, 0]]), "Z": np.diag([1.0, -1.0]),
}


def _dense_pauli(n: int, s: str) -> np.ndarray:
    """Full 2^n operator for string s (char i acts on qubit i)."""
    op = np.array([[1.0]])
    for q in range(n):  # little-endian: qubit q is bit q -> kron order
        letter = s[q] if q < len(s) else "I"
        op = np.kron(_P[letter], op)
    return op


@pytest.mark.parametrize("s", ["Z", "X", "Y", "XX", "ZY", "XIZY", "IIII"])
def test_expectation_pauli_matches_dense(s):
    cd = lib.random_circuit(4, 25, seed=8)
    psi = oracle.simulate(cd)
    want = np.real(psi.conj() @ _dense_pauli(4, s) @ psi)
    got = float(observables.expectation_pauli(jnp.asarray(psi), s))
    assert abs(got - want) < 1e-5


def test_dict_form_and_bad_letter():
    cd = lib.ghz(3)
    psi = oracle.simulate(cd)
    a = float(observables.expectation_pauli(jnp.asarray(psi), {0: "X", 2: "X"}))
    b = float(observables.expectation_pauli(jnp.asarray(psi), "XIX"))
    assert abs(a - b) < 1e-6
    with pytest.raises(ValueError):
        observables.expectation_pauli(jnp.asarray(psi), "XQ")


def test_ghz_stabilizers():
    # GHZ-3 stabilizer group: XXX = +1, ZZI = +1, YYX = -1.
    psi = jnp.asarray(oracle.simulate(lib.ghz(3)))
    assert abs(float(observables.expectation_pauli(psi, "XXX")) - 1.0) < 1e-6
    assert abs(float(observables.expectation_pauli(psi, "ZZ")) - 1.0) < 1e-6
    assert abs(float(observables.expectation_pauli(psi, "YYX")) + 1.0) < 1e-6


def test_expectation_sum_hamiltonian():
    cd = lib.random_circuit(3, 15, seed=3)
    psi = oracle.simulate(cd)
    terms = [(0.5, "ZZ"), (-1.25, "XIX"), (2.0, "IYZ")]
    want = sum(c * np.real(psi.conj() @ _dense_pauli(3, s) @ psi)
               for c, s in terms)
    got = float(observables.expectation_sum(jnp.asarray(psi), terms))
    assert abs(got - want) < 1e-5


def test_maxcut_energy_on_computational_state():
    # |0101> on a 4-cycle: every edge crosses the cut -> energy 4.
    psi = np.zeros(16, dtype=complex)
    psi[0b0101] = 1.0
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    got = float(observables.maxcut_energy(jnp.asarray(psi), edges))
    assert abs(got - 4.0) < 1e-6


def test_api_expectation_pauli():
    val = api.expectation_pauli(lib.ghz(4), "XXXX")
    assert abs(val - 1.0) < 1e-5
