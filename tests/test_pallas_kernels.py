"""Pallas panel-kernel tests (interpret mode on CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from quantum_simulations_tpu.circuit import gates as G
from quantum_simulations_tpu.ops import dense
from quantum_simulations_tpu.ops.pallas_kernels import (
    from_planar, panel_apply_planar, to_planar,
)


def _rand_state(n, seed=0):
    rng = np.random.default_rng(seed)
    psi = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    return (psi / np.linalg.norm(psi)).astype(np.complex64)


def _rand_unitary(dim, seed=1):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(dim, dim)) + 1j * rng.normal(size=(dim, dim))
    Q, _ = np.linalg.qr(A)
    return Q


@pytest.mark.parametrize("n", [9, 12])
def test_panel_kernel_matches_xla(n):
    psi = _rand_state(n)
    W = _rand_unitary(128)
    re, im = to_planar(jnp.asarray(psi))
    ore, oim = panel_apply_planar(re, im, W, interpret=True, block_rows=2)
    got = np.asarray(from_planar(ore, oim))
    want = np.asarray(dense.apply_low_panel(jnp.asarray(psi), W))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_panel_rotate_kernel_matches_composition():
    n = 10
    psi = _rand_state(n, seed=3)
    W = _rand_unitary(128, seed=4)
    re, im = to_planar(jnp.asarray(psi))
    ore, oim = panel_apply_planar(re, im, W, rotate=True, interpret=True,
                                  block_rows=2)
    got = np.asarray(from_planar(ore, oim))
    want = np.asarray(dense.rotate_bits_right(
        dense.apply_low_panel(jnp.asarray(psi), W), 7))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_panel_kernel_gate_semantics():
    """A real gate panel (H wall + CNOT on low qubits) through the kernel."""
    n = 10
    ops = [((q,), G.H()) for q in range(7)] + [((0, 3), G.CNOT())]
    W = dense.compose_low_panel(ops, 7)
    psi = _rand_state(n, seed=9)
    re, im = to_planar(jnp.asarray(psi))
    ore, oim = panel_apply_planar(re, im, W, interpret=True, block_rows=4)
    got = np.asarray(from_planar(ore, oim))
    from quantum_simulations_tpu.oracle import dense_numpy as oracle
    want = psi.astype(np.complex128)
    for qubits, U in ops:
        want = oracle.apply_gate(want, list(qubits), U)
    np.testing.assert_allclose(got, want, atol=1e-4)


PAIR_CASES = [
    # (n, qa, qb) — column kernel (lo in [7,12], hi >= lo+4)
    (16, 15, 8), (16, 7, 14), (17, 16, 12), (18, 17, 7),
    # row kernel (lo >= 13)
    (16, 15, 13), (18, 17, 13), (19, 18, 14),
]


@pytest.mark.parametrize("n,qa,qb", PAIR_CASES)
@pytest.mark.parametrize("gate", ["SWAP", "CNOT", "CZ", "random"])
def test_pair_update_planar_matches_oracle(n, qa, qb, gate):
    from quantum_simulations_tpu.oracle import dense_numpy as oracle
    from quantum_simulations_tpu.ops.pallas_kernels import (
        pair_update_planar, pair_update_supported,
    )

    assert pair_update_supported(qa, qb)
    U = _rand_unitary(4, seed=n + qa) if gate == "random" else getattr(G, gate)()
    psi = _rand_state(n, seed=n * 31 + qa)
    re, im = to_planar(jnp.asarray(psi))
    ore, oim = pair_update_planar(re, im, qa, qb, U, interpret=True)
    got = np.asarray(from_planar(ore, oim))
    want = oracle.apply_gate(psi.astype(np.complex128), [qa, qb], U)
    np.testing.assert_allclose(got, want, atol=1e-5)


MIXED_CASES = [
    (14, 13, 3), (16, 10, 0), (15, 12, 6), (16, 2, 15),
]


@pytest.mark.parametrize("n,qa,qb", MIXED_CASES)
@pytest.mark.parametrize("gate", ["SWAP", "CNOT", "CZ", "random"])
def test_mixed_pair_planar_matches_oracle(n, qa, qb, gate):
    from quantum_simulations_tpu.oracle import dense_numpy as oracle
    from quantum_simulations_tpu.ops.pallas_kernels import (
        mixed_pair_planar, mixed_pair_supported,
    )

    assert mixed_pair_supported(qa, qb)
    U = _rand_unitary(4, seed=n + qa) if gate == "random" else getattr(G, gate)()
    psi = _rand_state(n, seed=n * 17 + qb)
    re, im = to_planar(jnp.asarray(psi))
    ore, oim = mixed_pair_planar(re, im, qa, qb, U, interpret=True)
    got = np.asarray(from_planar(ore, oim))
    want = oracle.apply_gate(psi.astype(np.complex128), [qa, qb], U)
    np.testing.assert_allclose(got, want, atol=1e-5)


MIXED_LOW_CASES = [
    # (n, qa, qb): one qubit below the lane boundary (q<7), hi in 7..9.
    (12, 3, 7), (13, 6, 8), (14, 0, 9), (13, 7, 5),
]


@pytest.mark.parametrize("n,qa,qb", MIXED_LOW_CASES)
@pytest.mark.parametrize("gate", ["SWAP", "CNOT", "CZ", "CY", "random"])
def test_mixed_low_pair_planar_matches_oracle(n, qa, qb, gate):
    # "CNOT"/"CZ"/"CY" with qa as control hit the lane-diagonal vector
    # path when the lane qubit never moves; "SWAP"/"random" always take
    # the 128x128 MXU lane-operator path.
    from quantum_simulations_tpu.oracle import dense_numpy as oracle
    from quantum_simulations_tpu.ops.pallas_kernels import (
        mixed_low_pair_planar, mixed_low_pair_supported,
    )

    assert mixed_low_pair_supported(qa, qb)
    U = _rand_unitary(4, seed=n + qa) if gate == "random" else getattr(G, gate)()
    psi = _rand_state(n, seed=n * 13 + qa)
    re, im = to_planar(jnp.asarray(psi))
    ore, oim = mixed_low_pair_planar(re, im, qa, qb, U, interpret=True)
    got = np.asarray(from_planar(ore, oim))
    want = oracle.apply_gate(psi.astype(np.complex128), [qa, qb], U)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pair_update_supported_bounds():
    from quantum_simulations_tpu.ops.pallas_kernels import pair_update_supported

    assert not pair_update_supported(6, 14)   # low qubit below lane
    assert not pair_update_supported(8, 10)   # col kernel needs hi >= lo+4
    assert pair_update_supported(13, 14)      # row kernel: any span
    assert pair_update_supported(7, 11)


def test_planar_roundtrip():
    psi = _rand_state(8, seed=5)
    re, im = to_planar(jnp.asarray(psi))
    back = np.asarray(from_planar(re, im))
    np.testing.assert_allclose(back, psi, atol=1e-7)
