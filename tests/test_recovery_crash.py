"""Durability tests: WAL, double buffer, fencing, REAL crash injection.

Parity with the reference's crash pyramid (wenbo_engine/tests/
test_recovery_crash.py): crashes are real subprocess hard-exits via the
QST_CRASH_AFTER_STEP env hook (os._exit(1) after the buffer write but
before the WAL commit — the worst possible interruption point), then
recovery must converge to the oracle state.
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
from quantum_simulations_tpu.runtime import runner
from quantum_simulations_tpu.runtime.wal import (
    WAL, FencingError, FencingLock, WALMismatchError,
)

REPO = Path(__file__).resolve().parent.parent


def _run_subprocess(cd, work_dir, crash_after=None, extra="",
                    mode="fused", dtype="complex128", crash_mid=None):
    """Run the runner in a fresh process (real crash isolation)."""
    script = textwrap.dedent(f"""
        import os, sys, json
        sys.path.insert(0, {str(REPO)!r})
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        from quantum_simulations_tpu.runtime import runner
        cd = json.loads({json.dumps(cd)!r})
        {extra}
        # use_fusion=False => one step per level, so there are several
        # WAL commits to crash between.
        runner.run(cd, {str(work_dir)!r}, dtype={dtype!r}, mode={mode!r},
                   checkpoint_every=1, use_fusion=False)
        print("COMPLETED")
    """)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    if crash_after is not None:
        env[runner.CRASH_ENV] = str(crash_after)
    else:
        env.pop(runner.CRASH_ENV, None)
    if crash_mid is not None:
        env[runner.CRASH_MID_ENV] = str(crash_mid)
    else:
        env.pop(runner.CRASH_MID_ENV, None)
    return subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, env=env,
    )


@pytest.fixture
def cd():
    # GHZ(6): 6 dependency levels; with fusion disabled the runner takes
    # one step per level, so crash injection has commits to land between.
    return lib.ghz(6)


def test_clean_run_and_collect(tmp_path, cd):
    runner.run(cd, tmp_path, dtype="complex128")
    got = runner.collect_state(tmp_path)
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-10)
    wal = json.loads((tmp_path / "wal.json").read_text())
    assert wal["done_steps"] > 0


def test_crash_then_recover_converges(tmp_path, cd):
    res = _run_subprocess(cd, tmp_path, crash_after=1)
    assert res.returncode == 1, res.stderr
    assert "COMPLETED" not in res.stdout

    wal = json.loads((tmp_path / "wal.json").read_text())
    assert wal["done_steps"] <= 2  # crashed before committing step >= 1

    res = _run_subprocess(cd, tmp_path)  # recover = rerun
    assert res.returncode == 0, res.stderr
    got = runner.collect_state(tmp_path)
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-10)


def test_crash_at_step_zero_leaves_wal_empty(tmp_path, cd):
    res = _run_subprocess(cd, tmp_path, crash_after=0)
    assert res.returncode == 1
    wal = json.loads((tmp_path / "wal.json").read_text())
    assert wal["done_steps"] == 0
    assert wal["committed_buf"] is None
    # Recovery from scratch (same plan flags as the crashed run).
    runner.recover(cd, tmp_path, dtype="complex128", use_fusion=False)
    np.testing.assert_allclose(
        runner.collect_state(tmp_path), oracle.simulate(cd), atol=1e-10
    )


def test_repeated_crashes_make_progress(tmp_path, cd):
    for crash_at in (0, 1, 2, 3):
        res = _run_subprocess(cd, tmp_path, crash_after=crash_at)
        assert res.returncode == 1
    res = _run_subprocess(cd, tmp_path)
    assert res.returncode == 0, res.stderr
    np.testing.assert_allclose(
        runner.collect_state(tmp_path), oracle.simulate(cd), atol=1e-10
    )


def test_double_buffer_alternates(tmp_path, cd):
    # Multiple steps (fusion off) must alternate the a/b buffer files.
    runner.run(cd, tmp_path, dtype="complex128", use_fusion=False)
    assert (tmp_path / "state_a.npy").exists()
    assert (tmp_path / "state_b.npy").exists()


def test_resume_is_noop_when_complete(tmp_path, cd):
    runner.run(cd, tmp_path, dtype="complex128")
    before = json.loads((tmp_path / "wal.json").read_text())
    runner.run(cd, tmp_path, dtype="complex128")  # no-op resume
    after = json.loads((tmp_path / "wal.json").read_text())
    assert before == after


def test_wal_hash_mismatch_raises(tmp_path, cd):
    runner.run(cd, tmp_path, dtype="complex128")
    other = lib.qft(6)
    with pytest.raises(WALMismatchError):
        runner.run(other, tmp_path, dtype="complex128")


def test_checkpoint_cadence(tmp_path, cd):
    runner.run(cd, tmp_path, dtype="complex128", checkpoint_every=3)
    got = runner.collect_state(tmp_path)
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-10)
    wal = json.loads((tmp_path / "wal.json").read_text())
    assert wal["done_steps"] > 0


def test_no_wal_mode(tmp_path, cd):
    runner.run(cd, tmp_path / "nw", dtype="complex128", use_wal=False)
    got = runner.collect_state(tmp_path / "nw")
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=1e-10)


def test_empty_circuit(tmp_path):
    cd = {"number_of_qubits": 3, "gates": []}
    runner.run(cd, tmp_path, dtype="complex128")
    got = runner.collect_state(tmp_path)
    want = np.zeros(8, dtype=complex)
    want[0] = 1
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_sharded_runner(tmp_path, cd):
    from quantum_simulations_tpu.parallel import mesh as M
    mesh = M.make_mesh(4)
    runner.run(cd, tmp_path, mesh=mesh, dtype="complex128")
    np.testing.assert_allclose(
        runner.collect_state(tmp_path), oracle.simulate(cd), atol=1e-10
    )


# ---------------------------------------------------------------------------
# Flagship-kernel modes under WAL (the runner takes the kernel as a
# parameter, like wenbo_engine/runner/single_node.py:78-88)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", ["window", "capacity"])
def test_runner_mode_vs_oracle(tmp_path, mode):
    cd = lib.qft(6)
    runner.run(cd, tmp_path, mode=mode, use_fusion=False)
    got = runner.collect_state(tmp_path)
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=2e-5)
    manifest = json.loads((tmp_path / "manifest.json").read_text())
    assert manifest["mode"] == mode
    assert manifest["state_format"] == "planar"
    # Planar checkpoints are stored as (2, 2^n) float planes — the form
    # whose fetches work on restricted transfer backends.
    wal = json.loads((tmp_path / "wal.json").read_text())
    buf = np.load(tmp_path / f"state_{wal['committed_buf']}.npy")
    assert buf.ndim == 2 and buf.shape[0] == 2
    assert buf.dtype.kind == "f"


@pytest.mark.parametrize("mode", ["window", "capacity"])
def test_crash_recover_in_window_modes(tmp_path, mode):
    """Real subprocess kill mid-run, then resume — on the FAST path."""
    cd = lib.ghz(6)
    res = _run_subprocess(cd, tmp_path, crash_after=1, mode=mode,
                          dtype="complex64")
    assert res.returncode == 1, res.stderr
    assert "COMPLETED" not in res.stdout
    wal = json.loads((tmp_path / "wal.json").read_text())
    assert wal["done_steps"] <= 2

    res = _run_subprocess(cd, tmp_path, mode=mode, dtype="complex64")
    assert res.returncode == 0, res.stderr
    got = runner.collect_state(tmp_path)
    np.testing.assert_allclose(got, oracle.simulate(cd), atol=2e-5)


def test_sharded_runner_window_mode(tmp_path):
    from quantum_simulations_tpu.parallel import mesh as M

    cd = lib.qft(6)
    mesh = M.make_mesh(4)
    runner.run(cd, tmp_path, mesh=mesh, mode="window", dtype="complex64")
    np.testing.assert_allclose(
        runner.collect_state(tmp_path), oracle.simulate(cd), atol=2e-5
    )


# ---------------------------------------------------------------------------
# WAL unit behaviour
# ---------------------------------------------------------------------------

def test_wal_out_of_order_commit_rejected(tmp_path, cd):
    wal = WAL(tmp_path / "wal.json", cd)
    wal.commit_step(0, "a")
    with pytest.raises(ValueError):
        wal.commit_step(2, "b")


def test_wal_persistence_roundtrip(tmp_path, cd):
    wal = WAL(tmp_path / "wal.json", cd)
    wal.commit_step(0, "a")
    wal.commit_step(1, "b")
    wal2 = WAL(tmp_path / "wal.json", cd)
    assert wal2.done_steps == 2
    assert wal2.committed_buf == "b"


# ---------------------------------------------------------------------------
# Fencing
# ---------------------------------------------------------------------------

def test_fencing_blocks_second_acquirer(tmp_path):
    lock = FencingLock(tmp_path).acquire()
    with pytest.raises(FencingError):
        FencingLock(tmp_path).acquire()
    lock.release()
    FencingLock(tmp_path).acquire().release()


def test_fencing_context_manager(tmp_path):
    with FencingLock(tmp_path):
        assert (tmp_path / "runner.lock").exists()
    assert not (tmp_path / "runner.lock").exists()


def test_fencing_breaks_dead_pid_lock(tmp_path):
    # Fake a lock held by a dead pid on this host.
    import socket
    (tmp_path / "runner.lock").write_text(json.dumps({
        "pid": 2**22 + 12345, "host": socket.gethostname(), "ts": 0,
    }))
    FencingLock(tmp_path).acquire().release()  # must break the stale lock


def test_fencing_respects_remote_fresh_lock(tmp_path):
    import time
    (tmp_path / "runner.lock").write_text(json.dumps({
        "pid": 1, "host": "other-host", "ts": time.time(),
    }))
    with pytest.raises(FencingError):
        FencingLock(tmp_path).acquire()


def test_fencing_breaks_remote_stale_lock(tmp_path):
    (tmp_path / "runner.lock").write_text(json.dumps({
        "pid": 1, "host": "other-host", "ts": 0,
    }))
    FencingLock(tmp_path).acquire().release()


# ---------------------------------------------------------------------------
# Relational metadata ledger + event log (wired into the runner)
# ---------------------------------------------------------------------------

def test_metadata_ledger_reflects_crash_and_recovery(tmp_path, cd):
    from quantum_simulations_tpu.circuit.contract import (
        circuit_hash, validate_circuit_dict,
    )
    from quantum_simulations_tpu.runtime.metadata import MetadataStore

    wd = tmp_path / "wd"
    r = _run_subprocess(cd, wd, crash_after=2)
    assert r.returncode != 0  # really crashed

    run_id = circuit_hash(validate_circuit_dict(cd))[:16]
    with MetadataStore(wd / "metadata.sqlite") as meta:
        # The crash happened after the buffer write, before the commit:
        # the crashed step must be PENDING and the run still RUNNING.
        assert meta.wal_pending_steps(run_id) == [2]
        assert meta.get_run(run_id)["status"] == "RUNNING"

    r2 = _run_subprocess(cd, wd)  # recover
    assert "COMPLETED" in r2.stdout
    with MetadataStore(wd / "metadata.sqlite") as meta:
        assert meta.get_run(run_id)["status"] == "DONE"
        assert meta.wal_pending_steps(run_id) == []
        last = meta.wal_last_committed(run_id)
        assert last is not None and last[0] >= 2
        ck = meta.latest_checkpoint(run_id)
        assert ck is not None and ck["sha256"] and ck["size_bytes"] > 0
    np.testing.assert_allclose(
        runner.collect_state(wd), oracle.simulate(cd), atol=1e-10
    )


def test_checkpoint_sha_verified_on_resume(tmp_path, cd):
    wd = tmp_path / "wd"
    r = _run_subprocess(cd, wd, crash_after=2)
    assert r.returncode != 0
    # Corrupt the committed buffer the resume will load.
    wal = json.loads((wd / "wal.json").read_text())
    buf_file = wd / f"state_{wal['committed_buf']}.npy"
    blob = bytearray(buf_file.read_bytes())
    blob[-9] ^= 0xFF  # flip a payload byte
    buf_file.write_bytes(bytes(blob))
    r2 = _run_subprocess(cd, wd)
    assert r2.returncode != 0
    assert "corrupt" in (r2.stderr + r2.stdout)


def test_event_log_written(tmp_path, cd):
    from quantum_simulations_tpu.utils.logging import EventLog

    wd = tmp_path / "wd"
    runner.run(cd, wd, dtype="complex128", use_fusion=False)
    events = EventLog(wd / "events.jsonl").read()
    kinds = [e["kind"] for e in events]
    assert kinds[0] == "run_start"
    assert "step_commit" in kinds
    assert kinds[-1] == "run_done"
    assert "runner.step" in events[-1]["metrics"]


def test_crash_mid_checkpoint_write_recovers(tmp_path, cd):
    """Die DURING the checkpoint write (truncated .tmp, no rename).

    The worst interruption point after the post-write one: the dst
    buffer still holds its stale previous content and a garbage .tmp
    sits in the work dir.  Recovery must ignore both and converge.
    (Reference analogue: partial-dst cleanup in
    wenbo_engine/tests/test_recovery_crash.py.)
    """
    wd = tmp_path / "wd"
    r = _run_subprocess(cd, wd, crash_mid=2)
    assert r.returncode != 0
    wal = json.loads((wd / "wal.json").read_text())
    assert wal["done_steps"] == 2  # the mid-write step was NOT committed
    tmps = list(wd.glob("state_*.npy.tmp"))
    assert tmps, "expected a partial .tmp from the interrupted write"
    assert b"truncated" in tmps[0].read_bytes()
    r2 = _run_subprocess(cd, wd)
    assert r2.returncode == 0, r2.stderr
    np.testing.assert_allclose(
        runner.collect_state(wd), oracle.simulate(cd), atol=1e-10
    )


def test_crash_mid_first_checkpoint_then_recover(tmp_path, cd):
    """Mid-write crash before ANY commit: resume restarts from zero."""
    wd = tmp_path / "wd"
    r = _run_subprocess(cd, wd, crash_mid=0)
    assert r.returncode != 0
    wal = json.loads((wd / "wal.json").read_text())
    assert wal["done_steps"] == 0 and wal["committed_buf"] is None
    # Collecting an uncommitted run fails with a clear message, not a
    # numpy load error on a missing buffer.
    with pytest.raises(RuntimeError, match="no committed state"):
        runner.collect_state(wd)
    r2 = _run_subprocess(cd, wd)
    assert r2.returncode == 0, r2.stderr
    np.testing.assert_allclose(
        runner.collect_state(wd), oracle.simulate(cd), atol=1e-10
    )


def test_corrupt_wal_file_fails_stop(tmp_path, cd):
    """An unparseable WAL record is external damage: refuse to guess."""
    from quantum_simulations_tpu.runtime.wal import WALCorruptError

    wd = tmp_path / "wd"
    runner.run(cd, wd, dtype="complex128", use_fusion=False)
    for garbage in (b"{not json", b'{"done_steps": "soon"}',
                    b"[1, 2, 3]"):
        (wd / "wal.json").write_bytes(garbage)
        with pytest.raises(WALCorruptError, match="unreadable"):
            WAL(wd / "wal.json", cd)


def test_window_bounded_steps_cadence_and_crash(tmp_path):
    """Deep all-local circuit + max_levels_per_step: the flagship
    window kernels commit durable progress at a real cadence
    single-chip, survive a mid-run kill, and resume WITHOUT redoing
    committed steps (reference: per-pass commits in
    wenbo_engine/runner/single_node.py:141-216)."""
    cd = lib.qft(6)  # 11 levels, all local single-chip
    wd = tmp_path / "wd"
    script_kw = ("mode='window', checkpoint_every=2, "
                 "max_levels_per_step=1")
    import textwrap as _tw

    def run_once(crash_after=None):
        script = _tw.dedent(f"""
            import os, sys, json
            sys.path.insert(0, {str(REPO)!r})
            import jax
            jax.config.update("jax_platforms", "cpu")
            from quantum_simulations_tpu.runtime import runner
            cd = json.loads({json.dumps(cd)!r})
            runner.run(cd, {str(wd)!r}, {script_kw})
            print("COMPLETED")
        """)
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        if crash_after is not None:
            env[runner.CRASH_ENV] = str(crash_after)
        else:
            env.pop(runner.CRASH_ENV, None)
        return subprocess.run([sys.executable, "-c", script],
                              capture_output=True, text=True, env=env)

    from quantum_simulations_tpu.circuit.fusion import compile_steps

    n_steps_total = len(compile_steps(cd, k=6, max_levels_per_step=1))
    r = run_once(crash_after=5)  # dies at the step-5 checkpoint
    assert r.returncode == 1, r.stderr
    wal = json.loads((wd / "wal.json").read_text())
    assert 0 < wal["done_steps"] < n_steps_total
    committed_at_crash = wal["done_steps"]

    r2 = run_once()
    assert r2.returncode == 0, r2.stderr
    wal2 = json.loads((wd / "wal.json").read_text())
    assert wal2["done_steps"] == n_steps_total
    # Resume did NOT redo committed work: step events in the log start
    # at the crash point, and with checkpoint_every=2 there are
    # multiple distinct commits (real cadence, not one final commit).
    events = [json.loads(l) for l in
              (wd / "events.jsonl").read_text().splitlines()]
    commits = [e for e in events if e["kind"] == "step_commit"]
    assert len({e["step"] for e in commits}) >= 4
    resumed_steps = {e["step"] for e in commits
                     if e["step"] >= committed_at_crash}
    assert resumed_steps  # progress beyond the crash point
    np.testing.assert_allclose(
        runner.collect_state(wd), oracle.simulate(cd), atol=1e-6
    )
