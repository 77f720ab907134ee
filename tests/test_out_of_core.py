"""Out-of-core (host-DRAM / disk spill) runner tests.

Parity with the reference's out-of-core pyramid
(wenbo_engine/tests/test_out_of_core_e2e.py + test_nonlocal.py): tiny
stripes force every cross-stripe group case; disk backend adds WAL +
double-buffer + real crash injection via QST_CRASH_AFTER_STRIPE.
"""
import json
import os
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

from quantum_simulations_tpu.circuit import library as lib
from quantum_simulations_tpu.oracle import dense_numpy as oracle
from quantum_simulations_tpu.runtime import spill
from quantum_simulations_tpu.runtime.chunk_store import DiskBuffer, HostBuffer

REPO = Path(__file__).resolve().parent.parent

CIRCUITS = [
    ("ghz7", lib.ghz(7)),
    ("qft6", lib.qft(6)),
    ("w6", lib.w_state(6)),
    ("random7", lib.random_circuit(7, 60, seed=5)),
    ("sycamore6", lib.sycamore_like(6, depth=4)),
]


@pytest.mark.parametrize("m", [2, 3, 5])
@pytest.mark.parametrize("tag,cd", CIRCUITS, ids=[c[0] for c in CIRCUITS])
def test_host_spill_vs_oracle(tag, cd, m):
    got = spill.run_out_of_core(cd, stripe_qubits=m, backend="host",
                                dtype="complex128")
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-10)


@pytest.mark.parametrize("tag,cd", CIRCUITS[:3], ids=[c[0] for c in CIRCUITS[:3]])
def test_disk_spill_vs_oracle(tmp_path, tag, cd):
    wd = spill.run_out_of_core(cd, stripe_qubits=3, backend="disk",
                               work_dir=tmp_path)
    got = spill.collect_state(wd)
    # on-disk dtype is complex64
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=2e-5)


def test_stripe_group_stacking_all_cases():
    """2q gates with every local/stripe-bit split (the butterfly grid)."""
    n, m = 5, 2
    for qa, qb in [(0, 1), (0, 3), (3, 0), (2, 4), (4, 2), (1, 4)]:
        cd = {"number_of_qubits": n, "gates": (
            [{"qubits": [q], "gate": "H"} for q in range(n)]
            + [{"qubits": [q], "gate": "T"} for q in range(0, n, 2)]
            + [{"qubits": [qa, qb], "gate": "CNOT"}]
        )}
        got = spill.run_out_of_core(cd, stripe_qubits=m, backend="host",
                                    dtype="complex128")
        np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-10,
                                   err_msg=f"({qa},{qb})")


def test_disk_buffer_roundtrip(tmp_path):
    buf = DiskBuffer(tmp_path / "b", n=4, m=2)
    arr = buf.to_array()
    assert arr[0] == 1.0 and np.count_nonzero(arr) == 1
    stripe = np.arange(4, dtype=np.complex64)
    buf.write(2, stripe)
    np.testing.assert_array_equal(buf.read(2), stripe)
    reopened = DiskBuffer.open(tmp_path / "b")
    np.testing.assert_array_equal(reopened.read(2), stripe)


def test_disk_crash_recovery(tmp_path):
    cd = lib.ghz(6)
    script = textwrap.dedent(f"""
        import os, sys, json
        sys.path.insert(0, {str(REPO)!r})
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        import jax
        jax.config.update("jax_platforms", "cpu")
        from quantum_simulations_tpu.runtime import spill
        cd = json.loads({json.dumps(json.dumps(cd))!r} if False else '''{json.dumps(cd)}''')
        spill.run_out_of_core(cd, stripe_qubits=3, backend="disk",
                              work_dir={str(tmp_path)!r}, use_fusion=False)
        print("COMPLETED")
    """)
    env = dict(os.environ)
    env[spill.CRASH_ENV] = "20"  # crash mid-run after 20 stripe writes
    res = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, env=env)
    assert res.returncode == 1, res.stderr
    env.pop(spill.CRASH_ENV)
    res = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, env=env)
    assert res.returncode == 0, res.stderr
    got = spill.collect_state(tmp_path)
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=2e-5)


def test_host_buffer_views():
    buf = HostBuffer(4, 2, dtype=np.complex128)
    assert buf.n_stripes == 4
    buf.write(1, np.full(4, 2.0, dtype=np.complex128))
    assert buf.to_array()[4:8].sum() == 8.0


def test_disk_crash_recovery_nonlocal_path(tmp_path):
    """Crash INSIDE a non-local stripe-group write, then recover.

    GHZ-6 at m=3 with fusion off: steps 4+ apply CNOTs on qubits >= 3,
    driving the pipelined stripe-GROUP path; crashing after 28 stripe
    writes lands mid-way through a non-local step (8 writes/step), so
    recovery must discard the partially-written dst buffer.
    """
    cd = lib.ghz(6)
    script = textwrap.dedent(f"""
        import os, sys, json
        sys.path.insert(0, {str(REPO)!r})
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        import jax
        jax.config.update("jax_platforms", "cpu")
        from quantum_simulations_tpu.runtime import spill
        cd = json.loads('''{json.dumps(cd)}''')
        spill.run_out_of_core(cd, stripe_qubits=3, backend="disk",
                              work_dir={str(tmp_path)!r}, use_fusion=False)
        print("COMPLETED")
    """)
    env = dict(os.environ)
    env[spill.CRASH_ENV] = "28"
    res = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, env=env)
    assert res.returncode == 1, res.stderr
    wal = json.loads((tmp_path / "wal.json").read_text())
    assert wal["done_steps"] < 6  # crash really interrupted the run
    env.pop(spill.CRASH_ENV)
    res = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, env=env)
    assert res.returncode == 0, res.stderr
    got = spill.collect_state(tmp_path)
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=2e-5)


def test_slice_bench_smoke():
    """slice_run's extrapolation machinery on a tiny configuration."""
    os.environ.setdefault("QST_BENCH_PLATFORM", "cpu")
    from quantum_simulations_tpu.bench.spill_bw import slice_run

    out = slice_run(n=14, stripe_qubits=10, stripes_measured=2)
    kinds = {r["step_kind"] for r in out["measured"]}
    assert kinds == {"local", "nonlocal"}
    assert out["total_stripe_passes"] == out["steps"] * (1 << 4)
    assert out["est_full_run_s"] > 0


class TestStagedSpill:
    """Atlas staging on the out-of-core tier — the reference's primary
    staging use case (fewer non-local stripe-group passes,
    wenbo_engine/runner/single_node.py:109-121)."""

    def test_host_staged_matches_oracle(self):
        from quantum_simulations_tpu.runtime import spill

        cd = lib.qft(9)
        want = oracle.simulate(cd)
        got = spill.run_out_of_core(
            cd, stripe_qubits=5, backend="host", dtype="complex128",
            use_staging=True, staging_method="heuristic")
        np.testing.assert_allclose(got, want, atol=1e-10)

    def test_disk_staged_matches_oracle_and_records_mapping(self, tmp_path):
        from quantum_simulations_tpu.runtime import spill

        cd = lib.qft(8)
        want = oracle.simulate(cd)
        out = spill.run_out_of_core(
            cd, stripe_qubits=4, backend="disk", work_dir=tmp_path,
            dtype="complex128", use_staging=True,
            staging_method="heuristic")
        got = spill.collect_state(out)
        np.testing.assert_allclose(got, want, atol=1e-10)

    def test_staging_reduces_group_steps(self):
        """QFT's all-to-all CR ladder: staging must cut non-local steps."""
        from quantum_simulations_tpu.circuit import staging as S
        from quantum_simulations_tpu.circuit.fusion import compile_steps

        cd = lib.qft(10)
        m = 5
        plain = sum(1 for s in compile_steps(cd, k=m) if s.nonlocal_ops)
        staged_cd, _, _ = S.stage_circuit(cd, m, "heuristic")
        staged = sum(
            1 for s in compile_steps(staged_cd, k=m) if s.nonlocal_ops)
        assert staged < plain, (staged, plain)

    def test_api_route_staged_spill(self):
        from quantum_simulations_tpu.api import simulate
        from quantum_simulations_tpu.utils.config import SimulatorConfig

        cd = lib.ghz(8)
        got = simulate(cd, SimulatorConfig(
            stripe_qubits=4, dtype="complex128", use_staging=True))
        want = oracle.simulate(cd)
        np.testing.assert_allclose(got, want, atol=1e-10)


def test_spill_sync_mode_matches_pipelined():
    from quantum_simulations_tpu.runtime import spill

    cd = lib.qft(8)
    want = oracle.simulate(cd)
    for pipe in (True, False):
        got = spill.run_out_of_core(cd, stripe_qubits=5, backend="host",
                                    dtype="complex128", pipeline=pipe)
        np.testing.assert_allclose(got, want, atol=1e-10)


class TestF32Transfer:
    """``transfer='f32'``: interleaved-float stripe I/O for backends
    whose DMA path lacks complex transfers or large single fetches
    (measured on the axon tunnel — bench/probe_transfer.py).  The
    device programs still compute complex64; only the boundary
    representation changes, so results must match native byte-for-byte
    semantics."""

    @pytest.mark.parametrize("tag,cd", CIRCUITS[:4],
                             ids=[c[0] for c in CIRCUITS[:4]])
    def test_host_f32_vs_oracle(self, tag, cd):
        got = spill.run_out_of_core(cd, stripe_qubits=3, backend="host",
                                    transfer="f32")
        np.testing.assert_allclose(got, oracle.simulate(cd), atol=2e-5)

    def test_f32_matches_native_exactly(self):
        """Same circuit, both transfer modes: identical complex64 bits
        (the conversion is a pure relayout, not an arithmetic change)."""
        cd = lib.random_circuit(7, 40, seed=11)
        nat = spill.run_out_of_core(cd, stripe_qubits=3, backend="host")
        f32 = spill.run_out_of_core(cd, stripe_qubits=3, backend="host",
                                    transfer="f32")
        np.testing.assert_array_equal(nat, f32)

    def test_disk_f32_vs_oracle(self, tmp_path):
        cd = lib.qft(6)
        wd = spill.run_out_of_core(cd, stripe_qubits=3, backend="disk",
                                   work_dir=tmp_path, transfer="f32")
        got = spill.collect_state(wd)
        np.testing.assert_allclose(got, oracle.simulate(cd), atol=2e-5)

    def test_f32_group_path_sync_and_pipelined(self):
        """Cross-stripe CNOTs drive the per-slice group drain."""
        cd = {"number_of_qubits": 6, "gates": (
            [{"qubits": [q], "gate": "H"} for q in range(6)]
            + [{"qubits": [0, 5], "gate": "CNOT"},
               {"qubits": [4, 1], "gate": "CNOT"},
               {"qubits": [3, 5], "gate": "CZ"}])}
        want = oracle.simulate(cd)
        for pipe in (True, False):
            got = spill.run_out_of_core(cd, stripe_qubits=2, backend="host",
                                        transfer="f32", pipeline=pipe)
            np.testing.assert_allclose(got, want, atol=2e-5)

    def test_f32_rejects_complex128(self):
        with pytest.raises(ValueError, match="complex64"):
            spill.run_out_of_core(lib.ghz(4), stripe_qubits=2,
                                  backend="host", dtype="complex128",
                                  transfer="f32")

    def test_api_route_spill_transfer(self):
        from quantum_simulations_tpu.api import simulate
        from quantum_simulations_tpu.utils.config import SimulatorConfig

        cd = lib.ghz(6)
        got = simulate(cd, SimulatorConfig(stripe_qubits=3,
                                           spill_transfer="f32"))
        np.testing.assert_allclose(got, oracle.simulate(cd), atol=2e-5)


def test_api_full_stack_devices_workdir_staging(tmp_path):
    """n_devices>1 + work_dir (WAL runner) + staging TOGETHER."""
    from quantum_simulations_tpu.api import simulate
    from quantum_simulations_tpu.utils.config import SimulatorConfig

    cd = lib.qft(10)
    want = oracle.simulate(cd)
    cfg = SimulatorConfig(n_devices=8, dtype="complex128",
                          use_staging=True, staging_method="heuristic",
                          use_wal=True, checkpoint_every=1)
    got = simulate(cd, cfg, work_dir=tmp_path / "run")
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-10)
    # resume over the finished run is a no-op that returns the same state
    got2 = simulate(cd, cfg, work_dir=tmp_path / "run")
    np.testing.assert_allclose(np.asarray(got2), want, atol=1e-10)
