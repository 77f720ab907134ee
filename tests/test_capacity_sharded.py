"""Sharded capacity: in-place planar window execution on a mesh.

The 34q target (v5p-16, 2^30 amplitudes/chip) needs every shard to run
single-copy: ``planar_io`` (the complex form never exists) and
``inplace`` (every Pallas pass aliases in->out) threaded through the
shard_map window body.  Validated here on the virtual 8-device CPU
mesh against the oracle, including staged boundary SWAPs that collapse
into per-plane ``all_to_all`` reshards.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantum_simulations_tpu.circuit import library as lib
from quantum_simulations_tpu.circuit import staging as S
from quantum_simulations_tpu.oracle import dense_numpy as oracle
from quantum_simulations_tpu.parallel import executor as E
from quantum_simulations_tpu.parallel import mesh as M


def _run_planar_inplace(cd, mesh, per_step=False):
    n = cd["number_of_qubits"]
    _, fns = E.build_circuit_fns(
        mesh, cd, mode="window", inplace=True, planar_io=True,
        per_step=per_step, dtype=jnp.complex64,
    )
    re, im = M.zero_state_planar_sharded(mesh, n)
    if per_step:
        for fn in fns:
            re, im = fn(re, im)
    else:
        re, im = fns(re, im)
    from quantum_simulations_tpu.utils.transfer import fetch_array

    return (fetch_array(re) + 1j * fetch_array(im)).astype(np.complex64)


@pytest.mark.parametrize("tag,cd", [
    ("qft10", lib.qft(10)),
    ("nonstab11", lib.non_stabilizer(11, depth=3)),
    ("ghz12", lib.ghz(12)),
])
def test_sharded_capacity_inplace_vs_oracle(tag, cd):
    mesh = M.make_mesh(8)
    got = _run_planar_inplace(cd, mesh)
    want = oracle.simulate(cd).astype(np.complex64)
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_sharded_capacity_per_step_chains_planes():
    """Per-step planar fns (the WAL runner's granularity) chain (re, im)
    without ever forming the complex state."""
    cd = lib.qft(10)
    mesh = M.make_mesh(4)
    got = _run_planar_inplace(cd, mesh, per_step=True)
    np.testing.assert_allclose(
        got, oracle.simulate(cd).astype(np.complex64), atol=3e-5)


def test_sharded_capacity_staged_reshard_on_planes():
    """Staged plan: boundary SWAPs must run as per-plane all_to_all
    reshards inside the in-place planar body, and match the oracle
    after the qubit-map permutation."""
    from quantum_simulations_tpu.parallel.reshard import (
        plan_boundary_reshard,
    )

    n, d = 11, 3
    k = n - d
    gates = [{"qubits": [q], "gate": "H"} for q in range(n)]
    for q in range(n - 1):
        gates.append({"qubits": [q, q + 1], "gate": "CNOT"})
    for q in range(k, n):
        gates.append({"qubits": [q % k, q], "gate": "SWAP"})
        gates.append({"qubits": [q], "gate": "H"})
    cd = {"number_of_qubits": n, "gates": gates}
    staged, log2phys, _ = S.stage_circuit(cd, k, "heuristic")

    mesh = M.make_mesh(8)
    steps, _ = E.build_circuit_fns(
        mesh, staged, mode="window", inplace=True, planar_io=True,
        dtype=jnp.complex64)
    pairs = sum(len(plan_boundary_reshard(s.nonlocal_ops, k)[0])
                for s in steps)
    assert pairs > 0, "staged plan produced no boundary reshard"

    got = S.permute_state(_run_planar_inplace(staged, mesh), log2phys)
    want = oracle.simulate(cd).astype(np.complex64)
    np.testing.assert_allclose(got, want, atol=3e-5)
