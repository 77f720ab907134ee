"""Utils (config/logging/timing) and sqlite MetadataStore tests."""
import time

from quantum_simulations_tpu.runtime.metadata import MetadataStore
from quantum_simulations_tpu.utils.config import SimulatorConfig
from quantum_simulations_tpu.utils.logging import EventLog, get_logger, setup_logging
from quantum_simulations_tpu.utils.timing import Metrics


def test_config_roundtrip(tmp_path):
    cfg = SimulatorConfig(dtype="complex128", mode="panel", stripe_qubits=20)
    cfg.extra["custom"] = 1
    cfg.save(tmp_path / "cfg.json")
    back = SimulatorConfig.load(tmp_path / "cfg.json")
    assert back.dtype == "complex128"
    assert back.mode == "panel"
    assert back.stripe_qubits == 20
    assert back.extra["custom"] == 1


def test_logging_namespaced():
    root = setup_logging()
    log = get_logger("runner")
    assert log.name == "qst.runner"
    log.info("hello")  # must not raise
    assert root is setup_logging()  # idempotent


def test_event_log(tmp_path):
    ev = EventLog(tmp_path / "events.jsonl")
    ev.emit("step_committed", step=3, buf="a")
    ev.emit("run_done", steps=4)
    recs = ev.read()
    assert len(recs) == 2
    assert recs[0]["kind"] == "step_committed" and recs[0]["step"] == 3


def test_metrics():
    m = Metrics()
    with m.timer("kernel"):
        time.sleep(0.01)
    m.count("gates", 5)
    snap = m.snapshot()
    assert snap["timers_s"]["kernel"] >= 0.01
    assert snap["counts"]["gates"] == 5
    assert snap["counts"]["kernel.calls"] == 1
    m.reset()
    assert m.snapshot()["counts"] == {}


def test_metadata_store_lifecycle(tmp_path):
    with MetadataStore(tmp_path / "meta.db") as ms:
        ms.create_run("r1", "hash1", 10, 50, {"mode": "panel"})
        ms.wal_pending("r1", 0)
        ms.wal_commit("r1", 0, "a")
        ms.wal_pending("r1", 1)
        # crash here: reconcile marks step 1 FAILED
        stale = ms.reconcile("r1")
        assert stale == [1]
        assert ms.wal_last_committed("r1") == (0, "a")
        ms.add_checkpoint("r1", 0, "/x/state_a.npy", size_bytes=100)
        cp = ms.latest_checkpoint("r1")
        assert cp["step"] == 0 and cp["size_bytes"] == 100
        ms.finish_run("r1")
        run = ms.get_run("r1")
        assert run["status"] == "DONE" and run["config"]["mode"] == "panel"
        assert len(ms.list_runs()) == 1


def test_metadata_store_persistence(tmp_path):
    with MetadataStore(tmp_path / "m.db") as ms:
        ms.create_run("r2", "h", 4, 3)
        ms.wal_commit("r2", 0, "b")
    with MetadataStore(tmp_path / "m.db") as ms2:
        assert ms2.wal_last_committed("r2") == (0, "b")
