"""n=33 c64 spill-tier verification machinery (bench/corpus33.py),
validated at small n where a dense oracle exists.

- `backprop_amp`: adjoint lightcone evaluation must reproduce dense
  amplitudes exactly (c128) for mixed X/H/CNOT/CCX/T segments;
- `chunk_state_fn`: the stripe filler and the per-index amplitude
  oracle must describe the SAME normalized state;
- `spill.run_out_of_core(single_copy=True, initial_state=...)`: the
  single-buffer host tier must match the dense oracle from a custom
  initial state, including stripe-group (host-bit) passes.
"""
import jax
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")

from quantum_simulations_tpu.bench.corpus33 import (
    backprop_amp, chunk_state_fn,
)
from quantum_simulations_tpu.oracle import dense_numpy as oracle
from quantum_simulations_tpu.runtime import spill


def _rand_segment(n, rng, n_gates=8):
    gates = []
    for _ in range(n_gates):
        kind = rng.choice(["X", "H", "CNOT", "CCX", "T", "SDG"])
        qs = list(rng.choice(n, size={"X": 1, "H": 1, "T": 1, "SDG": 1,
                                      "CNOT": 2, "CCX": 3}[kind],
                             replace=False))
        gates.append({"qubits": [int(q) for q in qs], "gate": kind})
    return gates


@pytest.mark.parametrize("seed", range(4))
def test_backprop_amp_matches_dense(seed):
    n = 10
    rng = np.random.default_rng(seed)
    gates = _rand_segment(n, rng)
    psi0 = rng.standard_normal(1 << n) + 1j * rng.standard_normal(1 << n)
    psi0 /= np.linalg.norm(psi0)
    want = oracle.simulate({"number_of_qubits": n, "gates": gates},
                           initial_state=psi0.copy())
    for j in rng.integers(0, 1 << n, size=6):
        v = backprop_amp(int(j), gates, n)
        keys = np.fromiter(v.keys(), np.int64, len(v))
        vals = np.fromiter(v.values(), np.complex128, len(v))
        got = np.sum(np.conj(vals) * psi0[keys])
        assert abs(got - want[int(j)]) < 1e-12


def test_chunk_state_consistency():
    n, cb = 12, 8
    stripe, amps = chunk_state_fn(n, seed=5, chunk_bits=cb)
    L = 1 << 10
    full = np.concatenate([stripe(s, L) for s in range((1 << n) // L)])
    assert abs(np.linalg.norm(full) - 1.0) < 1e-5
    idxs = np.random.default_rng(0).integers(0, 1 << n, size=32)
    a = amps(idxs)
    np.testing.assert_allclose(a, full[idxs], atol=1e-7)


def test_single_copy_spill_with_initial_state():
    n, m = 12, 9  # 8 stripes, host bits 9..11
    rng = np.random.default_rng(3)
    psi0 = (rng.standard_normal(1 << n) + 1j * rng.standard_normal(1 << n))
    psi0 = (psi0 / np.linalg.norm(psi0)).astype(np.complex64)
    gates = [{"qubits": [0, 5], "gate": "CNOT"},
             {"qubits": [3], "gate": "H"},
             {"qubits": [10], "gate": "H"},           # host bit: group pass
             {"qubits": [2, 11], "gate": "CNOT"},     # local-host pair
             {"qubits": [9, 10], "gate": "CZ"},       # host-host diag
             {"qubits": [1], "gate": "T"}]
    cd = {"number_of_qubits": n, "gates": gates}
    L = 1 << m
    got = spill.run_out_of_core(
        cd, stripe_qubits=m, backend="host", dtype="complex64",
        use_wal=False, single_copy=True,
        initial_state=lambda s: psi0[s * L:(s + 1) * L])
    want = oracle.simulate(cd, initial_state=psi0.astype(np.complex128))
    assert float(np.max(np.abs(got - want))) < 1e-6


def test_single_copy_rejected_off_host():
    with pytest.raises(ValueError):
        spill.run_out_of_core({"number_of_qubits": 4, "gates": []},
                              stripe_qubits=3, backend="disk",
                              work_dir="/tmp/x", single_copy=True)
