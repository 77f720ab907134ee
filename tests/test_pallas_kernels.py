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


def test_planar_roundtrip():
    psi = _rand_state(8, seed=5)
    re, im = to_planar(jnp.asarray(psi))
    back = np.asarray(from_planar(re, im))
    np.testing.assert_allclose(back, psi, atol=1e-7)
