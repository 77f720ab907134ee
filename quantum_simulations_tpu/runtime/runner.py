"""Fault-tolerant circuit runner: sharded execution + WAL + checkpoints.

The TPU analogue of the reference's out-of-core runner
(``wenbo_engine/runner/single_node.py``): the state lives in (sharded)
HBM; after each committed step the runner snapshots it to an
alternating pair of host-side buffer files (a/b double buffer, atomic
writes), then commits the step to the WAL.  A crash at any point loses
at most the uncommitted step; resume re-loads the last committed
buffer and continues.  Crash injection for tests via the
``QST_CRASH_AFTER_STEP`` env var (process hard-kills itself after
writing step N's buffer but *before* the WAL commit — the worst spot).

Checkpoint cadence is configurable (``checkpoint_every``): between
checkpoints the state stays on-device, so the fault-tolerance tax is
one device->host transfer every c steps instead of disk traffic per
gate like the reference's per-step chunk rewrites.
"""
from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path

import numpy as np

from ..circuit.contract import circuit_hash, validate_circuit_dict
from ..parallel import executor as E
from ..parallel import mesh as M
from ..utils import timing
from ..utils.logging import EventLog, get_logger
from .wal import WAL, FencingLock, atomic_write_bytes, atomic_write_json

CRASH_ENV = "QST_CRASH_AFTER_STEP"
# Crash MID checkpoint write: a partial .tmp is left behind, the
# destination buffer keeps its previous (older) content, nothing was
# renamed or committed.  Recovery must ignore the garbage tmp and
# resume from the last committed buffer.
CRASH_MID_ENV = "QST_CRASH_MID_CHECKPOINT"

log = get_logger("runner")


def _buf_path(work_dir: Path, name: str) -> Path:
    return work_dir / f"state_{name}.npy"


def _save_state(work_dir: Path, name: str, psi) -> str:
    """Write a state buffer atomically; returns its sha256 hex digest.

    ``psi`` is either a (possibly sharded) complex vector or an
    (re, im) plane pair — planar checkpoints are stored as one
    (2, 2^n) float array (f32 transfers work on restricted backends
    where complex fetches don't; see utils/transfer.py).
    """
    from ..utils.transfer import fetch_array

    if isinstance(psi, tuple):
        host = np.stack([fetch_array(psi[0]), fetch_array(psi[1])])
    else:
        host = fetch_array(psi)
    import io

    bio = io.BytesIO()
    np.save(bio, host, allow_pickle=False)
    blob = bio.getvalue()
    atomic_write_bytes(_buf_path(work_dir, name), blob)
    return hashlib.sha256(blob).hexdigest()


def _verify_buffer(work_dir: Path, name: str, want_sha: str | None) -> None:
    """Integrity check of a checkpoint buffer before resuming from it."""
    if not want_sha:
        return
    got = hashlib.sha256(_buf_path(work_dir, name).read_bytes()).hexdigest()
    if got != want_sha:
        raise RuntimeError(
            f"checkpoint buffer {name!r} corrupt: sha256 {got[:12]}... != "
            f"recorded {want_sha[:12]}..."
        )


def _load_state(work_dir: Path, name: str) -> np.ndarray:
    return np.load(_buf_path(work_dir, name), allow_pickle=False)


def jax_block_until_ready(psi) -> None:
    """block_until_ready for arrays and (re, im) plane tuples alike."""
    import jax

    jax.block_until_ready(psi)


def run(
    circuit_dict: dict,
    work_dir,
    *,
    mesh=None,
    dtype="complex64",
    mode: str = "fused",
    use_wal: bool = True,
    use_fencing: bool = False,
    use_fusion: bool = True,
    panel_width: int | None = 7,
    use_staging: bool = False,
    staging_method: str = "auto",
    checkpoint_every: int = 1,
    max_levels_per_step: int | None = None,
    resume: bool = True,
    event_log: str | None = None,
) -> Path:
    """Run a circuit with durability; returns the work dir.

    The final state is in the buffer named by the WAL's
    ``committed_buf`` (read it back with :func:`collect_state`, which
    also undoes the staging qubit permutation when staging was used).

    ``mode`` selects the execution kernels under the WAL, like the
    reference's runner taking its kernel as a parameter
    (``wenbo_engine/runner/single_node.py:78-88``):

    * ``'fused'``    — per-gate traced XLA program (default);
    * ``'window'``   — the flagship planar Pallas window kernels; the
      state lives as (re, im) f32 planes between steps (no per-step
      complex<->planar retile) and checkpoints are written from the
      planes;
    * ``'capacity'`` — window kernels with ``input_output_aliases`` on
      every pass (the n >= 29 single-copy tier) — durability at the
      capacity ceiling.

    ``max_levels_per_step`` bounds how many circuit levels one durable
    step may absorb.  Single-chip every gate is local and unbounded
    fusion folds the whole circuit into one step, so ``checkpoint_every``
    would only ever see one step; a bound (e.g. 4) makes deep runs
    commit progress at real intervals, like the reference's runner
    committing per batched I/O pass.

    ``staging_method='auto'`` schedules with the heuristic reorderer
    and keeps the staged circuit only if it actually reduces exchange
    rounds — circuits dominated by diagonal/control-structured
    non-local gates (e.g. QFT's CR ladder) already cost zero traffic
    through the runtime exchange planner and are left alone.
    """
    cd = validate_circuit_dict(circuit_dict)
    work_dir = Path(work_dir)
    work_dir.mkdir(parents=True, exist_ok=True)
    if mesh is None:
        mesh = M.make_mesh(1)

    log2phys = None
    if use_staging and mesh.size > 1:
        from ..circuit import staging as S
        from ..parallel.distributed import device_bit_costs

        n = cd["number_of_qubits"]
        k = M.shard_width(mesh, n)
        bit_costs = device_bit_costs(mesh)
        if staging_method == "auto":
            # Portfolio over methods (and the unstaged plan), scored by
            # the mesh-aware weighted-bytes objective — the scheduler
            # optimizes exactly what staging_stats reports.
            cd, log2phys, _ = S.choose_staging(cd, k, bit_costs=bit_costs)
        else:
            cd, log2phys, _ = S.stage_circuit(
                cd, k, staging_method, bit_costs=bit_costs)
        if log2phys == list(range(n)):
            log2phys = None
    atomic_write_json(work_dir / "qubit_mapping.json", {
        "log2phys": log2phys if log2phys else None,
    })

    lock = FencingLock(work_dir) if use_fencing else None
    if lock:
        lock.acquire()
    try:
        return _run_inner(
            cd, work_dir, mesh, dtype, mode, use_wal, use_fusion,
            panel_width, checkpoint_every, resume, event_log,
            max_levels_per_step,
        )
    finally:
        if lock:
            lock.release()


def _run_inner(cd, work_dir, mesh, dtype, mode, use_wal, use_fusion,
               panel_width, checkpoint_every, resume, event_log=None,
               max_levels_per_step=None):
    from .metadata import MetadataStore

    if mode not in ("fused", "window", "capacity"):
        raise ValueError(f"runner mode must be fused|window|capacity, "
                         f"got {mode!r}")
    # Window/capacity hold the state as f32 planes BETWEEN steps too:
    # per-step complex<->planar retiles cost ~2.5 HBM passes each
    # (bench/overhead.py), and planar checkpoints fetch as f32.
    planar = mode in ("window", "capacity")
    inplace = mode == "capacity"

    events = EventLog(event_log or (work_dir / "events.jsonl"))
    with timing.timer("runner.compile"):
        steps, fns = E.build_circuit_fns(
            mesh, cd, use_fusion=use_fusion, panel_width=panel_width,
            per_step=True, donate=True,
            mode="window" if planar else "fused",
            inplace=inplace, planar_io=planar, dtype=dtype,
            max_levels_per_step=max_levels_per_step,
        )
    n = cd["number_of_qubits"]

    # Queryable multi-run ledger (the reference's relational metadata
    # tier) alongside the hot-path JSON WAL.
    meta = MetadataStore(work_dir / "metadata.sqlite")
    run_id = circuit_hash(cd)[:16]
    prior = meta.get_run(run_id)
    stale = meta.reconcile(run_id)  # PENDING left by a crash -> FAILED
    if stale:
        log.info("recovery: %d stale PENDING step(s) marked FAILED", len(stale))
        events.emit("recovery", run_id=run_id, failed_steps=stale)
    if prior is None or not resume:
        meta.create_run(run_id, circuit_hash(cd), n, len(cd["gates"]),
                        config={"mesh": int(mesh.size), "dtype": str(dtype),
                                "use_fusion": use_fusion,
                                "panel_width": panel_width})
    events.emit("run_start", run_id=run_id, n_qubits=n, n_steps=len(steps),
                mesh=int(mesh.size), resumed=bool(prior and resume))

    plan_sig = (
        f"mesh={mesh.size},mode={mode},fusion={use_fusion},"
        f"panel={panel_width},steps={len(steps)}"
    )
    wal = WAL(work_dir / "wal.json", cd, plan=plan_sig) if use_wal else None
    if wal and not resume:
        # Fresh run requested: reset the log.
        wal.done_steps = 0
        wal.committed_buf = None
        wal._flush()

    start_step = wal.done_steps if wal else 0
    if start_step >= len(steps) and wal and wal.committed_buf:
        meta.close()
        return work_dir  # already complete

    if wal and wal.committed_buf and start_step > 0:
        ck = meta.latest_checkpoint(run_id)
        if ck and ck["path"] == wal.committed_buf:
            _verify_buffer(work_dir, wal.committed_buf, ck["sha256"])
        saved = _load_state(work_dir, wal.committed_buf)
        if planar:
            psi = M.put_state_planar(mesh, saved)
        else:
            if saved.ndim == 2:  # planar checkpoint, complex resume
                saved = saved[0] + 1j * saved[1]
            psi = M.put_state(mesh, saved, dtype)
        cur_buf = wal.committed_buf
    else:
        if planar:
            psi = M.zero_state_planar_sharded(mesh, n)
        else:
            psi = M.zero_state_sharded(mesh, n, dtype)
        start_step = 0
        cur_buf = "b"  # first write goes to "a"

    crash_after = int(os.environ.get(CRASH_ENV, "-1"))
    crash_mid = int(os.environ.get(CRASH_MID_ENV, "-1"))

    if not steps:  # empty circuit: the zero state is the result
        _save_state(work_dir, "a", psi)
        if wal:
            wal.committed_buf = "a"
            wal._flush()
        else:
            atomic_write_json(work_dir / "result.json", {"committed_buf": "a"})
        cur_buf = "a"  # the tail path records/finishes with this buffer

    atomic_write_json(work_dir / "manifest.json", {
        "n_qubits": n,
        "dtype": str(np.dtype(dtype)),
        "mode": mode,
        "state_format": "planar" if planar else "complex",
        "n_steps": len(steps),
        "circuit_hash": circuit_hash(cd),
        "mesh_devices": int(mesh.size),
    })

    for step_idx in range(start_step, len(steps)):
        with timing.timer("runner.step"):
            psi = fns[step_idx](*psi) if planar else fns[step_idx](psi)
        last = step_idx == len(steps) - 1
        if not (use_wal or last):
            continue
        if use_wal and not last and (step_idx + 1 - start_step) % checkpoint_every:
            continue
        dst = "a" if cur_buf == "b" else "b"
        meta.wal_pending(run_id, step_idx)
        # Steps dispatch async; the chained compute drains here (the
        # step timer alone measures dispatch, steps+sync = execution).
        with timing.timer("runner.sync"):
            jax_block_until_ready(psi)
        if crash_mid >= 0 and step_idx >= crash_mid:
            # Die with the checkpoint half-written: truncated bytes in
            # the .tmp, no rename (atomic_write_bytes never ran its
            # os.replace), WAL untouched.
            tmp = _buf_path(work_dir, dst).with_name(
                _buf_path(work_dir, dst).name + ".tmp")
            tmp.write_bytes(b"\x93NUMPY<truncated mid-write>")
            os._exit(1)
        with timing.timer("runner.checkpoint"):
            sha = _save_state(work_dir, dst, psi)
        if crash_after >= 0 and step_idx >= crash_after:
            os._exit(1)  # crash injection: buffer written, WAL NOT committed
        if wal:
            # Commit possibly several steps at once (checkpoint cadence).
            for s in range(wal.done_steps, step_idx + 1):
                wal.commit_step(s, dst)
        meta.wal_commit(run_id, step_idx, dst)
        meta.add_checkpoint(
            run_id, step_idx, dst, sha256=sha,
            size_bytes=_buf_path(work_dir, dst).stat().st_size,
        )
        events.emit("step_commit", run_id=run_id, step=step_idx, buf=dst)
        cur_buf = dst

    if not use_wal:
        atomic_write_json(work_dir / "result.json", {"committed_buf": cur_buf})
    meta.finish_run(run_id, "DONE")
    meta.close()
    events.emit("run_done", run_id=run_id,
                metrics=timing.snapshot()["timers_s"])
    log.info("run %s done: %d steps", run_id, len(steps))
    return work_dir


def recover(circuit_dict: dict, work_dir, **kw) -> Path:
    """Crash recovery = resume the run (double-buffer makes this safe)."""
    return run(circuit_dict, work_dir, resume=True, **kw)


def collect_state(work_dir, *, apply_permutation: bool = True) -> np.ndarray:
    """Read the final committed state from a finished run's work dir.

    Undoes the staging qubit permutation (recorded in
    qubit_mapping.json) unless ``apply_permutation=False``.
    """
    work_dir = Path(work_dir)
    wal_path = work_dir / "wal.json"
    if wal_path.exists():
        buf = json.loads(wal_path.read_text())["committed_buf"]
    else:
        buf = json.loads((work_dir / "result.json").read_text())["committed_buf"]
    if buf is None:
        raise RuntimeError(
            f"run in {work_dir} has no committed state yet (it crashed "
            f"before its first checkpoint, or is still running) — "
            f"resume it with runner.recover() before collecting")
    psi = _load_state(work_dir, buf)
    if psi.ndim == 2:  # planar (window/capacity) checkpoint: (2, 2^n) f32
        psi = (psi[0] + 1j * psi[1]).astype(np.complex64)
    mapping_path = work_dir / "qubit_mapping.json"
    if apply_permutation and mapping_path.exists():
        l2p = json.loads(mapping_path.read_text()).get("log2phys")
        if l2p:
            from ..circuit.staging import permute_state

            psi = permute_state(psi, l2p)
    return psi
