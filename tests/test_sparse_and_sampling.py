"""Sparse-engine + sampling tests.

Headline capability parity (v2/v3 Spark tiers): 1000-qubit GHZ,
200-qubit W state, 63-bit index support, sparse==dense cross-checks.
"""
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantum_simulations_tpu.circuit import library as lib
from quantum_simulations_tpu.oracle import dense_numpy as oracle
from quantum_simulations_tpu.ops import sampling
from quantum_simulations_tpu.sparse.engine import SparseState, simulate_sparse


# ---------------------------------------------------------------------------
# Sparse vs oracle (both tiers)
# ---------------------------------------------------------------------------

CIRCUITS = [
    ("bell", lib.bell()),
    ("ghz6", lib.ghz(6)),
    ("qft5", lib.qft(5)),
    ("w6", lib.w_state(6)),
    ("random", lib.random_circuit(6, 40, seed=8)),
]


@pytest.mark.parametrize("tier", ["numpy", "bigint"])
@pytest.mark.parametrize("tag,cd", CIRCUITS, ids=[c[0] for c in CIRCUITS])
def test_sparse_matches_oracle(tier, tag, cd):
    st = simulate_sparse(cd, force_tier=tier)
    np.testing.assert_allclose(st.to_dense(), oracle.simulate(cd), atol=1e-10)


def test_ghz_63_qubits_numpy_tier():
    st = simulate_sparse(lib.ghz(62))
    assert len(st) == 2
    s = 1 / math.sqrt(2)
    assert abs(st.amplitude(0) - s) < 1e-12
    assert abs(st.amplitude((1 << 62) - 1) - s) < 1e-12


def test_ghz_1000_qubits():
    t0 = time.perf_counter()
    st = simulate_sparse(lib.ghz(1000))
    dt = time.perf_counter() - t0
    assert len(st) == 2
    all_ones = (1 << 1000) - 1
    assert abs(st.amplitude(all_ones)) > 0.7
    assert abs(st.norm() - 1.0) < 1e-9
    assert dt < 60  # reference: ~5 minutes on Spark


def test_w_200_qubits():
    st = simulate_sparse(lib.w_state(200))
    # Exactly 200 one-hot amplitudes of 1/sqrt(200).
    assert len(st) == 200
    for q in (0, 1, 199):
        assert abs(st.amplitude(1 << q) - 1 / math.sqrt(200)) < 1e-9


def test_sparse_pruning_threshold():
    st = simulate_sparse(lib.hadamard_wall(10), threshold=1e-15)
    assert len(st) == 1024
    assert abs(st.norm() - 1.0) < 1e-9


def test_top_amplitudes():
    st = simulate_sparse(lib.ghz(5))
    tops = st.top_amplitudes(2)
    assert {i for i, _ in tops} == {0, 31}


def test_dense_export_guard():
    st = simulate_sparse(lib.ghz(40))
    with pytest.raises(ValueError):
        st.to_dense()


# ---------------------------------------------------------------------------
# Sampling / measurement
# ---------------------------------------------------------------------------

def _as_jnp(cd):
    return jnp.asarray(oracle.simulate(cd), dtype=jnp.complex128)


def test_probabilities_and_norm():
    psi = _as_jnp(lib.ghz(4))
    p = np.asarray(sampling.probabilities(psi))
    assert abs(p.sum() - 1) < 1e-12
    assert abs(p[0] - 0.5) < 1e-12 and abs(p[15] - 0.5) < 1e-12


def test_expectation_z():
    # GHZ: <Z0 Z1> = +1, <Z0> = 0.
    psi = _as_jnp(lib.ghz(3))
    assert abs(float(sampling.expectation_z(psi, [0, 1])) - 1.0) < 1e-10
    assert abs(float(sampling.expectation_z(psi, [0]))) < 1e-10
    # |1> state: <Z> = -1.
    psi1 = jnp.asarray([0.0, 1.0], dtype=jnp.complex128)
    assert abs(float(sampling.expectation_z(psi1, [0])) + 1.0) < 1e-12


def test_qubit_probability_and_project():
    psi = _as_jnp(lib.ghz(3))
    assert abs(float(sampling.qubit_probability(psi, 1)) - 0.5) < 1e-12
    proj = sampling.project(psi, 1, 1)
    got = np.asarray(proj)
    want = np.zeros(8, dtype=complex)
    want[7] = 1.0
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_measure_collapses():
    psi = _as_jnp(lib.ghz(3))
    outcome, collapsed = sampling.measure_qubit(psi, 0, jax.random.PRNGKey(7))
    got = np.asarray(collapsed)
    idx = 7 if int(outcome) == 1 else 0
    want = np.zeros(8, dtype=complex)
    want[idx] = 1.0
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_sampling_distribution():
    psi = _as_jnp(lib.bell())
    samples = np.asarray(sampling.sample(psi, jax.random.PRNGKey(0), 4000))
    vals, counts = np.unique(samples, return_counts=True)
    assert set(vals) <= {0, 3}
    assert abs(counts[0] / 4000 - 0.5) < 0.05


def test_sample_large_path_deterministic():
    # 2^18 amps, shots*size > 2^24 -> routes through the hierarchical
    # inverse-CDF sampler (_hier_sample), not the flat categorical.
    target = (5 << 9) + 3  # crosses a block boundary at lb=9
    psi = jnp.zeros(1 << 18, dtype=jnp.complex64).at[target].set(1.0)
    samples = np.asarray(sampling.sample(psi, jax.random.PRNGKey(2), 300))
    assert (samples == target).all()


def test_sample_large_path_distribution():
    # Mass spread over four indices in different 2^9-blocks; 4000 shots
    # exercises multiple _chunked_invcdf chunks (chunk=512) plus the
    # padded remainder.
    idx = [0, (5 << 9) + 3, 1 << 17, (1 << 18) - 1]
    amps = np.sqrt([0.4, 0.3, 0.2, 0.1])
    psi = np.zeros(1 << 18, dtype=np.complex64)
    psi[idx] = amps
    samples = np.asarray(
        sampling.sample(jnp.asarray(psi), jax.random.PRNGKey(3), 4000))
    assert set(np.unique(samples)) <= set(idx)
    for j, p in zip(idx, [0.4, 0.3, 0.2, 0.1]):
        assert abs((samples == j).mean() - p) < 0.04


def test_chunked_invcdf_matches_numpy_inverse_cdf():
    """Same uniforms -> the JAX chunked pick equals numpy's searchsorted."""
    rng = np.random.default_rng(11)
    B, L = 32, 64
    p = rng.random((B, L)).astype(np.float32)
    s = p.sum(axis=1)
    cdf = np.cumsum(s)
    shots = 700  # > chunk and not a multiple of it
    u_b = (rng.random(shots) * cdf[-1]).astype(np.float32)
    u_l = rng.random(shots).astype(np.float32)
    blk_np = np.clip(np.searchsorted(cdf, u_b, side="right"), 0, B - 1)
    rows = p[blk_np]
    c = np.cumsum(rows, axis=1)
    loc_np = np.clip(
        (c < u_l[:, None] * c[:, -1:]).sum(axis=1), 0, L - 1)
    blk, loc = sampling._chunked_invcdf(
        jnp.asarray(cdf), lambda b: jnp.asarray(p)[b],
        jnp.asarray(u_b), jnp.asarray(u_l), shots, L, B)
    np.testing.assert_array_equal(np.asarray(blk), blk_np)
    np.testing.assert_array_equal(np.asarray(loc), loc_np)


def test_sample_bits_layout():
    # |q0=1, q1=0, q2=1> = index 5.
    psi = jnp.zeros(8, dtype=jnp.complex128).at[5].set(1.0)
    bits = np.asarray(sampling.sample_bits(psi, jax.random.PRNGKey(1), 8, 3))
    assert (bits == np.array([1, 0, 1], dtype=np.int8)).all()


def test_fidelity_phase_invariant():
    psi = _as_jnp(lib.qft(4))
    rotated = psi * np.exp(0.7j)
    assert abs(float(sampling.fidelity(psi, rotated)) - 1.0) < 1e-10


def test_parity_fold_uint64_high_bits():
    # Regression: bits above 31 must fold into the parity (uint64 path
    # previously started the xor-fold at >>16 and lost them).
    vals = jnp.asarray(
        np.array([1 << 40, (1 << 40) | 1, (1 << 33) | (1 << 2), 0],
                 dtype=np.uint64))
    got = np.asarray(sampling._parity_fold(vals))
    np.testing.assert_array_equal(got, [1, 0, 0, 0])


def test_expectation_z_matches_dense_formula():
    psi = _as_jnp(lib.random_circuit(5, 30, seed=3))
    p = np.abs(np.asarray(psi)) ** 2
    idx = np.arange(32)
    for qs in ([0], [4], [1, 3], [0, 2, 4]):
        mask = sum(1 << q for q in qs)
        signs = 1.0 - 2.0 * (np.bitwise_count(idx & mask) % 2)
        want = float(np.sum(p * signs))
        got = float(sampling.expectation_z(psi, list(qs)))
        assert abs(got - want) < 1e-8, (qs, got, want)


def test_sparse_state_sampling():
    st = simulate_sparse(lib.ghz(40))
    bits = st.sample_bits(200, seed=5)
    assert bits.shape == (200, 40)
    # GHZ: each shot is all-zeros or all-ones.
    rowsum = bits.sum(axis=1)
    assert set(np.unique(rowsum)) <= {0, 40}
    assert 0 < rowsum.sum() < 200 * 40  # both outcomes appear


def test_api_sample_sparse_mode():
    from quantum_simulations_tpu import api
    from quantum_simulations_tpu.utils.config import SimulatorConfig

    bits = api.sample(lib.ghz(30), shots=64,
                      config=SimulatorConfig(sparse=True))
    assert bits.shape == (64, 30)
    rowsum = bits.sum(axis=1)
    assert set(np.unique(rowsum)) <= {0, 30}


class TestShardedSampling:
    """SPMD hierarchical sampler on the virtual 8-device mesh."""

    def _mesh(self):
        from quantum_simulations_tpu.parallel.mesh import make_mesh
        return make_mesh(8)

    def test_deterministic_state(self):
        import jax
        from quantum_simulations_tpu.parallel import executor as E
        from quantum_simulations_tpu.ops.sampling import sample_bits_sharded

        mesh = self._mesh()
        # X on qubits 1 and 9 -> every sample must be that bitstring
        cd = {"number_of_qubits": 11, "gates": [
            {"gate": "X", "qubits": [1], "params": {}},
            {"gate": "X", "qubits": [9], "params": {}},
        ]}
        psi = E.simulate_sharded(mesh, cd)
        bits = np.asarray(sample_bits_sharded(
            psi, jax.random.PRNGKey(0), 64, 11, mesh))
        assert bits.shape == (64, 11)
        want = np.zeros(11, np.int8)
        want[1] = want[9] = 1
        assert (bits == want[None, :]).all()

    def test_ghz_support_and_balance(self):
        import jax
        from quantum_simulations_tpu.circuit import library as lib
        from quantum_simulations_tpu.parallel import executor as E
        from quantum_simulations_tpu.ops.sampling import sample_bits_sharded

        mesh = self._mesh()
        psi = E.simulate_sharded(mesh, lib.ghz(12))
        bits = np.asarray(sample_bits_sharded(
            psi, jax.random.PRNGKey(1), 400, 12, mesh))
        rows = {tuple(r) for r in bits.tolist()}
        assert rows <= {tuple([0] * 12), tuple([1] * 12)}
        frac1 = (bits[:, 0] == 1).mean()
        assert 0.3 < frac1 < 0.7  # 400 shots: ~14 sigma window

    def test_matches_dense_distribution(self):
        """Sharded sampler frequencies track |psi|^2 on a biased state."""
        import jax
        from quantum_simulations_tpu.circuit import library as lib
        from quantum_simulations_tpu.parallel import executor as E
        from quantum_simulations_tpu.ops.sampling import sample_bits_sharded

        mesh = self._mesh()
        cd = lib.qft(10)
        psi = E.simulate_sharded(mesh, cd)
        bits = np.asarray(sample_bits_sharded(
            psi, jax.random.PRNGKey(2), 2000, 10, mesh))
        idx = (bits.astype(np.int64) << np.arange(10)).sum(axis=1)
        dense = np.asarray(E.collect_state(psi))
        p = np.abs(dense) ** 2
        # QFT|0> is uniform: chi-square-ish sanity on bin occupancy
        counts = np.bincount(idx, minlength=1024)
        assert counts.max() < 2000 * (p.max() + 0.01) * 5

    def test_api_sample_sharded_route(self):
        from quantum_simulations_tpu.api import sample
        from quantum_simulations_tpu.utils.config import SimulatorConfig

        cd = {"number_of_qubits": 10, "gates": [
            {"gate": "H", "qubits": [0], "params": {}},
            {"gate": "CNOT", "qubits": [0, 9], "params": {}},
        ]}
        bits = sample(cd, 50, seed=3, config=SimulatorConfig(n_devices=8))
        assert bits.shape == (50, 10)
        # Bell pair between qubits 0 and 9: always equal
        assert (bits[:, 0] == bits[:, 9]).all()
        assert (bits[:, 1:9] == 0).all()


class TestShardedMeasurement:
    """SPMD measurement/projection/expectation on the 8-device mesh
    (cross-shard analogue of state_vector.hpp:829-897)."""

    def _psi(self, cd):
        from quantum_simulations_tpu.parallel import executor as E
        from quantum_simulations_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8)
        return mesh, E.simulate_sharded(mesh, cd, dtype="complex128")

    def test_expectation_z_matches_dense(self):
        import jax.numpy as jnp
        from quantum_simulations_tpu.circuit import library as lib
        from quantum_simulations_tpu.ops import sampling as S
        from quantum_simulations_tpu.parallel import executor as E

        cd = lib.qft(11)
        mesh, psi = self._psi(cd)
        dense = jnp.asarray(E.collect_state(psi))
        for qs in ([0], [10], [0, 10], [3, 9, 10], [8, 9]):
            want = float(S.expectation_z(dense, qs))
            got = float(S.expectation_z_sharded(psi, qs, 11, mesh))
            assert abs(got - want) < 1e-10, (qs, got, want)

    def test_qubit_probability_local_and_device_bits(self):
        import jax.numpy as jnp
        from quantum_simulations_tpu.circuit import library as lib
        from quantum_simulations_tpu.ops import sampling as S
        from quantum_simulations_tpu.parallel import executor as E

        cd = lib.w_state(11)
        mesh, psi = self._psi(cd)
        dense = jnp.asarray(E.collect_state(psi))
        for q in (0, 5, 8, 9, 10):  # 8-10 are device bits
            want = float(S.qubit_probability(dense, q))
            got = float(S.qubit_probability_sharded(psi, q, 11, mesh))
            assert abs(got - want) < 1e-10, q

    def test_project_device_bit_matches_dense(self):
        import numpy as np
        import jax.numpy as jnp
        from quantum_simulations_tpu.circuit import library as lib
        from quantum_simulations_tpu.ops import sampling as S
        from quantum_simulations_tpu.parallel import executor as E

        cd = lib.qft(10)
        mesh, psi = self._psi(cd)
        dense = jnp.asarray(E.collect_state(psi))
        for q, v in ((9, 1), (8, 0), (2, 1)):
            want = np.asarray(S.project(dense, q, v))
            got = np.asarray(E.collect_state(
                S.project_sharded(psi, q, v, 10, mesh)))
            np.testing.assert_allclose(got, want, atol=1e-10)

    def test_measure_ghz_collapses_globally(self):
        import jax
        import numpy as np
        from quantum_simulations_tpu.circuit import library as lib
        from quantum_simulations_tpu.ops import sampling as S
        from quantum_simulations_tpu.parallel import executor as E

        cd = lib.ghz(11)
        mesh, psi = self._psi(cd)
        outcome, collapsed = S.measure_qubit_sharded(
            psi, 9, jax.random.PRNGKey(5), 11, mesh)
        dense = np.asarray(E.collect_state(collapsed))
        # GHZ: measuring one qubit collapses ALL qubits to that value
        want_idx = ((1 << 11) - 1) if outcome else 0
        assert abs(abs(dense[want_idx]) - 1.0) < 1e-10
        assert np.count_nonzero(np.abs(dense) > 1e-12) == 1

    def test_api_expectation_z_sharded_route(self):
        from quantum_simulations_tpu.api import expectation_z
        from quantum_simulations_tpu.circuit import library as lib
        from quantum_simulations_tpu.utils.config import SimulatorConfig

        # GHZ: <Z_i Z_j> = 1, <Z_i> = 0
        cd = lib.ghz(10)
        zz = expectation_z(cd, [0, 9], SimulatorConfig(n_devices=8))
        z = expectation_z(cd, [4], SimulatorConfig(n_devices=8))
        assert abs(zz - 1.0) < 1e-6
        assert abs(z) < 1e-6
