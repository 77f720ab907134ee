"""Bench-suite smoke tests (tiny sizes, CPU platform)."""
import os

import pytest

os.environ.setdefault("QST_BENCH_PLATFORM", "cpu")


def test_suite_matrix_small():
    from quantum_simulations_tpu.bench import suite
    out = suite.run(sizes=(5,), dtype="complex64")
    assert out["n_mismatch"] == 0
    assert len(out["rows"]) > 5


def test_kernel_bw_small():
    from quantum_simulations_tpu.bench import kernel_bw
    out = kernel_bw.run(n=14, reps=1, iters=2)
    assert "panel128_8gates" in out["ops"]
    for v in out["ops"].values():
        # GBs can round to 0.0 for the tiny n=14 planes on a loaded
        # host — presence of the measurement (or a recorded error) is
        # the invariant, not its magnitude.
        assert "GBs" in v or "error" in v


def test_e2e_small():
    from quantum_simulations_tpu.bench import e2e
    out = e2e.run(sizes=(10,), families=("ghz", "qft"), reps=1)
    assert len(out["results"]) == 6  # 2 families x 3 modes
    for r in out["results"]:
        assert r["wall_s"] > 0 and r["amp_updates_per_s"] > 0


def test_sweep_small():
    from quantum_simulations_tpu.bench import sweep
    out = sweep.run(n=10, reps=1)
    assert len(out["rows"]) == 5


def test_shard_timing_small():
    from quantum_simulations_tpu.bench import sharded
    out = sharded.shard_timing(12, 4, depth=2, reps=1, interpret=True)
    assert out["shard_amplitudes"] == 1 << 10
    assert out["measured_shard_compute_s"] > 0
    assert out["collectives"] >= 1
    # every accounted byte figure must be <= collectives * full shard
    assert out["ici_bytes_per_chip"] <= out["collectives"] * (1 << 10) * 8
    assert out["pod_estimate_s"] >= out["measured_shard_compute_s"]


def test_spill_bw_small():
    from quantum_simulations_tpu.bench import spill_bw
    out = spill_bw.run(n=10, stripe_qubits=7)
    assert len(out["rows"]) == 2
    assert abs(out["rows"][0]["norm"] - 1) < 1e-4


def test_c128_diff_small():
    from quantum_simulations_tpu.bench import c128_diff
    out = c128_diff.run(sizes=(8,), families=("qft", "nonstab"),
                        segmented_n=10, segment_gates=16)
    assert out["met"], out
    modes = {r["mode"] for r in out["rows"]}
    assert "end_to_end" in modes
    assert any(m.startswith("segmented_restart") for m in modes)


def test_passes_roofline_small():
    """Per-pass roofline audit smoke (interpret kernels on CPU):
    deltas monotone, every row's floors positive, no row reported
    above 100%+epsilon of its own floor without the overhead label
    machinery intact."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from quantum_simulations_tpu.bench import passes

    out = passes.run(config="nonstab10", reps=2, samples=2)
    assert out["passes"] >= 1 and out["rows"]
    covered = [p for r in out["rows"] for p in r["passes"]]
    assert covered == list(range(out["passes"]))  # every pass attributed
    for r in out["rows"]:
        assert r["hbm_floor_ms"] >= 0  # rounds to 0 at toy n
        assert r["measured_ms"] >= 0
        assert r["binding"] in ("bandwidth", "MXU@HIGHEST",
                                "overhead/slack")
    ks = [c["k"] for c in out["raw_prefix_wall_ms"]]
    assert ks == list(range(out["passes"] + 1))
    assert len(out["per_rep_prefix_ms"]) == out["passes"] + 1
