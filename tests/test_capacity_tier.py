"""Capacity tier (n >= 29) product surface, at test sizes.

The reference exposes its out-of-core ceiling through the same run()
entry every user calls (``wenbo_engine/runner/single_node.py:78``);
these tests pin the equivalent TPU surface: ``mode='capacity'`` through
api / the CLI / the WAL runner, planar readout (norm / top-amplitudes /
sampling / <Z..Z>), and the clean trace-time guard replacing the
complex-fallback OOM (NOTES_ROUND2.md:92-95 hole).
"""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from quantum_simulations_tpu import api
from quantum_simulations_tpu.circuit import library as lib
from quantum_simulations_tpu.oracle import dense_numpy as oracle
from quantum_simulations_tpu.utils.config import SimulatorConfig

CAP = SimulatorConfig(mode="capacity")


CIRCUITS = [
    ("qft8", lib.qft(8)),
    ("nonstab10", lib.non_stabilizer(10, depth=3)),
    ("ghz12", lib.ghz(12)),
    ("sycamore10", lib.sycamore_like(10, depth=3)),
]


@pytest.mark.parametrize("tag,cd", CIRCUITS, ids=[c[0] for c in CIRCUITS])
def test_capacity_api_vs_oracle(tag, cd):
    res = api.simulate(cd, CAP)
    got = res.to_array()
    want = oracle.simulate(cd).astype(np.complex64)
    np.testing.assert_allclose(got, want, atol=2e-5)
    assert abs(res.norm2() - 1.0) < 1e-4


def test_capacity_top_amplitudes_exact():
    cd = lib.random_circuit(10, 60, seed=5)
    res = api.simulate(cd, CAP)
    want = oracle.simulate(cd)
    p = np.abs(want) ** 2
    want_vals = np.sort(p)[::-1][:8]
    got = res.top_amplitudes(8)
    # Tie-robust: the k probability VALUES must match the oracle's
    # sorted top-k, and every returned amplitude must be the oracle's
    # amplitude at that index.
    got_vals = np.array([abs(a) ** 2 for _, a in got])
    np.testing.assert_allclose(got_vals, want_vals, atol=1e-6)
    for i, a in got:
        assert abs(a - want[i]) < 2e-5


def test_capacity_sampler_matches_distribution():
    # GHZ: every sample must be all-zeros or all-ones, ~50/50.
    res = api.simulate(lib.ghz(12), CAP)
    bits = res.sample_bits(400, seed=3)
    assert bits.shape == (400, 12)
    rowsum = bits.sum(axis=1)
    assert set(rowsum.tolist()) <= {0, 12}
    frac = (rowsum == 12).mean()
    assert 0.35 < frac < 0.65


def test_capacity_sampler_nonuniform_marginals():
    # RY-rotated qubit: P(q0=1) = sin^2(theta/2), checked to ~4 sigma.
    theta = 1.1
    cd = {"number_of_qubits": 9, "gates": [
        {"qubits": [0], "gate": "RY", "params": {"theta": theta}},
        {"qubits": [5], "gate": "H"},
    ]}
    res = api.simulate(cd, CAP)
    p1 = np.sin(theta / 2) ** 2
    bits = res.sample_bits(2000, seed=7)
    got = bits[:, 0].mean()
    sigma = (p1 * (1 - p1) / 2000) ** 0.5
    assert abs(got - p1) < 4.5 * sigma
    assert abs(res.qubit_probability(0) - p1) < 1e-6


def test_capacity_expectation_z_and_pauli():
    cd = lib.qft(8)
    want = oracle.simulate(cd)
    res = api.simulate(cd, CAP)
    mask = (1 << 1) | (1 << 4)
    signs = np.array([(-1) ** bin(i & mask).count("1")
                      for i in range(want.size)])
    want_z = float((np.abs(want) ** 2 * signs).sum())
    assert abs(res.expectation_z([1, 4]) - want_z) < 1e-6
    # Pauli routing through the capacity tier (basis change in-circuit).
    from quantum_simulations_tpu.ops import observables
    import jax.numpy as jnp

    want_p = float(observables.expectation_pauli(
        jnp.asarray(want), "XZIY"))
    got_p = api.expectation_pauli(cd, "XZIY", CAP)
    assert abs(got_p - want_p) < 1e-5


def test_api_sample_routes_capacity():
    bits = api.sample(lib.ghz(10), 50, seed=1, config=CAP)
    assert bits.shape == (50, 10)
    assert set(bits.sum(axis=1).tolist()) <= {0, 10}


def test_capacity_guard_raises_cleanly(monkeypatch):
    """Non-diagonal 3q+ mixed-bit gate: ValueError, not an XLA OOM."""
    monkeypatch.setenv("QST_CAPACITY_GUARD_MIN", "256")
    ccx = {"number_of_qubits": 10, "gates": [
        {"qubits": [0], "gate": "H"},
        {"qubits": [0, 8, 9], "gate": "CCX"},
    ]}
    with pytest.raises(ValueError, match="no in-place planar kernel"):
        api.simulate(ccx, CAP)


def test_capacity_guard_allows_small_states():
    """Below the size threshold the complex fallback is memory-safe and
    the same circuit must run (and agree with the oracle)."""
    ccx = {"number_of_qubits": 10, "gates": [
        {"qubits": [0], "gate": "H"},
        {"qubits": [1], "gate": "H"},
        {"qubits": [0, 1, 9], "gate": "CCX"},
    ]}
    res = api.simulate(ccx, CAP)
    np.testing.assert_allclose(
        res.to_array(), oracle.simulate(ccx).astype(np.complex64),
        atol=2e-5)


# ---------------------------------------------------------------------------
# Liveness fuzz: random capacity-mode schedules must keep op count and
# peak plane liveness bounded (regression lock on the round-2 OOM class:
# without per-op barriers XLA's scheduler overlapped passes and peak
# liveness hit 11 planes = 44 GiB on qft30).
# ---------------------------------------------------------------------------

def test_capacity_schedule_liveness_fuzz(monkeypatch):
    import jax
    import jax.numpy as jnp

    from quantum_simulations_tpu.circuit.panelize import window_stats
    from quantum_simulations_tpu.runtime import simulator

    # Guard as it behaves at real capacity sizes: ANY op that would
    # take the 4x-peak complex fallback raises instead of OOMing.
    monkeypatch.setenv("QST_CAPACITY_GUARD_MIN", "256")

    from quantum_simulations_tpu.circuit import gates as G
    from quantum_simulations_tpu.circuit.panelize import (
        PhysGateOp, compile_window_schedule,
    )

    # A CCX straddling the lane window hits the complex-fallback path:
    # under the tiny guard it must REFUSE cleanly (the OOM-class lock).
    ccx = {"number_of_qubits": 12, "gates": [
        {"qubits": [0], "gate": "H"},
        {"qubits": [0, 10, 11], "gate": "CCX"}]}
    cases = [lib.random_circuit(12, 40, seed=s) for s in range(4)]
    cases += [lib.qft(13), lib.non_stabilizer(13, depth=4),
              lib.sycamore_like(12, depth=4),
              lib.FAMILIES["trotter_ising"](12),
              lib.FAMILIES["qaoa"](12),
              lib.FAMILIES["graph_state"](12), ccx]
    n_strict = n_guarded = 0
    for cd in cases:
        n = cd["number_of_qubits"]
        st = window_stats(cd, diag_terms_only=True)
        # Op-count sanity: window scheduling packs gates into panels —
        # it must never EXPAND the pass count beyond one op per gate
        # (+1 for a terminal permutation).
        assert 1 <= st["hbm_passes"] <= st["gates"] + 1, st

        fn = simulator.build_window_circuit_fn(
            cd, dtype="complex64", planar_io=True, inplace=True,
            donate=True)
        P = jax.ShapeDtypeStruct((1 << n,), jnp.float32)
        try:
            compiled = fn.lower(P, P).compile()
        except ValueError as e:
            # OOM-class lock: the only legal refusal is the clean
            # trace-time guard, never an allocation blowup.
            assert "no in-place planar kernel" in str(e), e
            n_guarded += 1
            continue

        # The strict 3-plane in-place property only holds when every
        # straddling pair maps to an ALIASED kernel; at these test
        # sizes (n=12-13) pairs below qubit 10 legally ride the
        # layout-safe planar-XLA path instead (kernel eligibility is
        # positional and tuned to the n>=29 geometry), so the strict
        # liveness bound applies to kernel-only schedules.
        ops = compile_window_schedule(cd, diag_terms_only=True)
        kernel_only = not any(
            isinstance(op, PhysGateOp) and not G.is_diagonal(op.U)
            for op in ops)
        if kernel_only:
            n_strict += 1
            ma = compiled.memory_analysis()
            plane = (1 << n) * 4
            # Peak temp liveness: 5-7 planes on the CPU interpret
            # build (the TPU Mosaic build runs at 3).  The round-2
            # regression class (missing barriers / lost aliasing)
            # lands at >= 11.
            peak_planes = ma.temp_size_in_bytes / plane
            assert peak_planes <= 8.0, (
                f"capacity liveness blowup: {peak_planes:.2f} planes "
                f"(n={n}, gates={st['gates']})")

        # And every schedule must be CORRECT end to end.
        from quantum_simulations_tpu.ops import dense
        re, im = jax.jit(lambda n=n: dense.zero_state_planar(n))()
        re, im = compiled(re, im)
        got = np.asarray(re) + 1j * np.asarray(im)
        want = oracle.simulate(cd)
        np.testing.assert_allclose(got, want, atol=3e-5)
    # The fuzz pool must exercise BOTH locks.
    assert n_strict >= 3 and n_guarded >= 1, (n_strict, n_guarded)


def test_cli_run_capacity(tmp_path):
    cd = lib.qft(8)
    path = tmp_path / "qft8.json"
    path.write_text(json.dumps(cd))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    p = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "from quantum_simulations_tpu.__main__ import main;"
         f"import sys; sys.exit(main(['run', {str(path)!r}, "
         "'--mode', 'capacity']))"],
        env=env, capture_output=True, text=True,
        cwd=Path(__file__).resolve().parent.parent)
    assert p.returncode == 0, p.stderr
    out = json.loads(p.stdout)
    assert out["mode"] == "capacity"
    assert abs(out["norm2"] - 1.0) < 1e-4
    assert len(out["top"]) == 8
