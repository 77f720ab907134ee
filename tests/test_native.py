"""Native C++ host-engine tests (skip if toolchain unavailable)."""
import numpy as np
import pytest

from quantum_simulations_tpu.circuit import gates as G
from quantum_simulations_tpu.circuit import library as lib
from quantum_simulations_tpu.oracle import dense_numpy as oracle

native = pytest.importorskip("quantum_simulations_tpu.native")
from quantum_simulations_tpu.oracle import native as nat  # noqa: E402

pytestmark = pytest.mark.skipif(
    not nat.available(), reason=f"native build failed: {native.BUILD_ERROR}"
)


def _rand(n, seed=0, dtype=np.complex128):
    rng = np.random.default_rng(seed)
    psi = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    return (psi / np.linalg.norm(psi)).astype(dtype)


@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
@pytest.mark.parametrize("q", [0, 3, 6])
def test_native_1q(dtype, q):
    psi = _rand(7, seed=q, dtype=dtype)
    want = oracle.apply_gate(psi.astype(np.complex128), [q], G.H())
    native.apply_1q(psi, q, G.H())
    atol = 1e-6 if dtype == np.complex64 else 1e-12
    np.testing.assert_allclose(psi, want, atol=atol)


@pytest.mark.parametrize("qa,qb", [(0, 1), (1, 0), (2, 6), (6, 2), (5, 3)])
def test_native_2q(qa, qb):
    psi = _rand(7, seed=qa * 8 + qb)
    want = oracle.apply_gate(psi, [qa, qb], G.CNOT())
    native.apply_2q(psi, qa, qb, G.CNOT())
    np.testing.assert_allclose(psi, want, atol=1e-12)


def test_native_diag():
    psi = _rand(6, seed=2)
    U = G.gate_matrix("CR", {"k": 3})
    want = oracle.apply_gate(psi, [4, 1], U)
    native.apply_diag(psi, [4, 1], np.diag(U))
    np.testing.assert_allclose(psi, want, atol=1e-12)


def test_native_norm2():
    psi = _rand(8, seed=1)
    assert abs(native.norm2(psi) - 1.0) < 1e-10


CIRCUITS = [
    ("qft8", lib.qft(8)),
    ("random", lib.random_circuit(8, 60, seed=3)),
    ("w7", lib.w_state(7)),
    ("qaoa", lib.qaoa_maxcut(8, p=2)),
    ("ccx", {"number_of_qubits": 4, "gates": [
        {"qubits": [0], "gate": "H"}, {"qubits": [1], "gate": "X"},
        {"qubits": [0, 1, 2], "gate": "CCX"}]}),
]


@pytest.mark.parametrize("tag,cd", CIRCUITS, ids=[c[0] for c in CIRCUITS])
def test_native_simulator_vs_oracle(tag, cd):
    got = nat.simulate(cd)
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-10)


def test_native_c64_accuracy():
    cd = lib.qft(10)
    got = nat.simulate(cd, dtype=np.complex64)
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=2e-5)


def test_threads_api():
    native.set_threads(2)
    cd = lib.ghz(6)
    np.testing.assert_allclose(nat.simulate(cd), oracle.simulate(cd), atol=1e-12)


# --- measure-with-RNG + state_equal (reference parity:
#     hisvsim_repo/state_vector.hpp:829-1003) ---

def test_native_measure_ghz_collapses_together():
    # GHZ: all qubits must agree, and the same seed must reproduce.
    cd = lib.ghz(6)
    base = oracle.simulate(cd)
    outcomes = set()
    for seed in range(12):
        psi = base.copy()
        out = native.measure(psi, list(range(6)), seed=seed)
        assert out in (0, 0b111111)
        outcomes.add(out)
        assert abs(native.norm2(psi) - 1.0) < 1e-10
        # Collapsed state is the matching basis vector.
        want = np.zeros_like(psi)
        want[0 if out == 0 else (1 << 6) - 1] = psi[0 if out == 0 else -1]
        np.testing.assert_allclose(np.abs(psi), np.abs(want), atol=1e-10)
        assert native.measure(base.copy(), list(range(6)), seed=seed) == out
    assert outcomes == {0, 0b111111}  # both branches seen across seeds


def test_native_measure_deterministic_qubit():
    # |psi> = |0>|1>: q1 always measures 1, q0 always 0, any seed.
    psi0 = np.zeros(4, dtype=np.complex128)
    psi0[0b10] = 1.0
    for seed in (0, 1, 99):
        psi = psi0.copy()
        assert native.measure(psi, [0, 1], seed=seed) == 0b10
        np.testing.assert_allclose(psi, psi0, atol=1e-12)


def test_native_measure_statistics_plus_state():
    # |+>: outcome frequency over seeds approaches 1/2.
    plus = np.full(2, 1 / np.sqrt(2), dtype=np.complex128)
    ones = sum(native.measure(plus.copy(), [0], seed=s) for s in range(400))
    assert 140 <= ones <= 260


@pytest.mark.parametrize("dtype,eps", [(np.complex64, 1e-4),
                                       (np.complex128, 3e-8)])
def test_native_state_equal(dtype, eps):
    a = _rand(8, seed=5, dtype=dtype)
    assert native.state_equal(a, a.copy())
    b = a.copy()
    b[17] += eps
    d = native.state_max_diff(a, b)
    assert abs(d - eps) < eps * 1e-3  # up to one ulp of the buffer dtype
    assert not native.state_equal(a, b, tol=eps / 10)
    assert native.state_equal(a, b, tol=eps * 10)


def test_native_state_equal_mismatch_raises():
    a = _rand(4, seed=1)
    with pytest.raises(ValueError):
        native.state_max_diff(a, a.astype(np.complex64))
    with pytest.raises(ValueError):
        native.state_max_diff(a, a[:8].copy())


@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_native_alloc_state_runs_circuit(dtype):
    """NUMA-interleaved buffer (first-touch mmap) behaves as a normal
    zeroed state: run a GHZ circuit in place, compare to the oracle,
    then free (reference: numa_alloc_interleaved,
    hisvsim_repo/state_vector.hpp:104)."""
    n = 12
    psi = native.alloc_state(1 << n, dtype=dtype)
    assert psi.size == 1 << n and psi.dtype == dtype
    assert not psi.flags.owndata  # backed by the engine's mapping
    np.testing.assert_array_equal(psi, 0)
    psi[0] = 1.0
    native.apply_1q(psi, 0, G.H())
    for q in range(n - 1):
        native.apply_2q(psi, q, q + 1, G.CNOT())
    want = oracle.simulate(lib.ghz(n)).astype(dtype)
    atol = 1e-6 if dtype == np.complex64 else 1e-12
    np.testing.assert_allclose(psi, want, atol=atol)
    native.free_state(psi)


def test_native_alloc_state_rejects_bad_dtype():
    with pytest.raises(TypeError):
        native.alloc_state(16, dtype=np.float32)
