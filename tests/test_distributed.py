"""Multi-host scaffolding tests (single-host image: 1-process cluster).

The real target is a v5p-16 pod slice; here the code path is driven
by bootstrapping an actual 1-process jax.distributed "cluster" in a
subprocess (initialize binds a coordinator socket, so it must not run
in the test process) — the same no-cluster stance the reference takes
for Spark (wenbo_engine/tests/test_spark_runner_small.py:27-44).
"""
import os
import socket
import subprocess
import sys

import pytest

from quantum_simulations_tpu.parallel import distributed as D
from quantum_simulations_tpu.parallel.mesh import make_mesh

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_init_distributed_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("QST_COORDINATOR", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    assert D.init_distributed() is False


def test_device_bit_costs_single_process():
    mesh = make_mesh(8)
    costs = D.device_bit_costs(mesh)
    assert costs == [D.ICI_COST] * 3  # all virtual devices share a process


def test_one_process_cluster_subprocess():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    code = f"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
from quantum_simulations_tpu.parallel import distributed as D
ok = D.init_distributed(
    coordinator_address="127.0.0.1:{port}", num_processes=1, process_id=0)
assert ok, "initialize returned False"
assert jax.process_count() == 1
mesh = D.make_pod_mesh(8)
assert mesh.size == 8
assert D.device_bit_costs(mesh) == [D.ICI_COST] * 3
from quantum_simulations_tpu.api import simulate
from quantum_simulations_tpu.utils.config import SimulatorConfig
import numpy as np
psi = np.asarray(simulate(
    {{"number_of_qubits": 10, "gates": [
        {{"gate": "H", "qubits": [0], "params": {{}}}},
        {{"gate": "CNOT", "qubits": [0, 9], "params": {{}}}},
    ]}}, SimulatorConfig(n_devices=8)))
assert abs(abs(psi[0]) ** 2 - 0.5) < 1e-6
assert abs(abs(psi[(1 << 9) | 1]) ** 2 - 0.5) < 1e-6
print("DIST_OK")
"""
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=REPO, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert "DIST_OK" in r.stdout, r.stdout + r.stderr


def test_weighted_staging_stats():
    """DCN-weighted byte accounting: a gate on a top device bit costs
    more than one on a low device bit under a multi-host cost model."""
    from quantum_simulations_tpu.circuit.staging import staging_stats
    from quantum_simulations_tpu.ops.exchange import weighted_exchange_bytes
    import numpy as np
    from quantum_simulations_tpu.circuit import gates as G

    k = 5
    costs = [1.0, 1.0, 20.0]  # device bits 0,1 = ICI; bit 2 = DCN
    # target on a device bit ships the active plane; control-side
    # device bits are insular (free) — hence (control, target) order.
    low = weighted_exchange_bytes(G.CNOT(), (0, k + 0), k, costs)
    top = weighted_exchange_bytes(G.CNOT(), (0, k + 2), k, costs)
    assert low > 0 and top == 20.0 * low

    cd = {"number_of_qubits": 8, "gates": [
        {"gate": "CNOT", "qubits": [0, 7], "params": {}},
        {"gate": "H", "qubits": [6], "params": {}},
    ]}
    st = staging_stats(cd, k, bit_costs=costs)
    assert st["weighted_bytes_staged"] <= st["weighted_bytes_unstaged"]
    assert st["bytes_staged"] <= st["bytes_unstaged"]
