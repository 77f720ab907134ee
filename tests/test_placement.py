"""Shard-placement verifier tests (distribution-check parity with the
reference's ``v2_spark/scripts/verify_distribution.py`` tier)."""
import json
import subprocess
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np

from quantum_simulations_tpu.parallel import placement
from quantum_simulations_tpu.parallel.mesh import make_mesh, zero_state_sharded

REPO = Path(__file__).resolve().parent.parent


class FakeMesh:
    """Duck-typed mesh: just .devices and .size (what placement needs)."""

    def __init__(self, process_indices):
        self.devices = np.array(
            [SimpleNamespace(process_index=p, id=i)
             for i, p in enumerate(process_indices)], dtype=object)
        self.size = len(process_indices)


def test_report_on_virtual_mesh():
    mesh = make_mesh(8)
    rep = placement.placement_report(mesh, n=6)
    assert rep["n_devices"] == 8 and rep["local_qubits"] == 3
    assert [r["amp_range"] for r in rep["devices"]] == [
        [s * 8, (s + 1) * 8] for s in range(8)]
    assert [b["qubit"] for b in rep["device_bits"]] == [3, 4, 5]
    # single-host virtual mesh: every device bit rides ICI
    assert all(b["link"] == "ICI" for b in rep["device_bits"])
    assert rep["invariants"]["ok"]


def test_verify_sharded_array_ok_and_replicated_fails():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(8)
    n = 6
    psi = zero_state_sharded(mesh, n)
    chk = placement.verify_sharded_array(psi, mesh, n)
    assert chk["ok"] and chk["addressable"] == 8, chk

    # A REPLICATED array is a placement violation: every shard covers
    # the full range instead of its 2^k slice.
    rep_sharding = NamedSharding(mesh, P())
    psi_rep = jax.device_put(np.zeros(1 << n, np.complex64), rep_sharding)
    bad = placement.verify_sharded_array(psi_rep, mesh, n)
    assert not bad["ok"] and bad["violations"]


def test_invariants_detect_non_contiguous_hosts():
    ok = placement.check_invariants(FakeMesh([0, 0, 1, 1]))
    assert ok["ok"] and ok["host_contiguous"]
    bad = placement.check_invariants(FakeMesh([0, 1, 0, 1]))
    assert not bad["host_contiguous"] and not bad["ok"]
    uneven = placement.check_invariants(FakeMesh([0, 0, 0, 1]))
    assert not uneven["equal_devices_per_host"] and not uneven["ok"]
    non_pow2 = placement.check_invariants(FakeMesh([0, 0, 0]))
    assert not non_pow2["power_of_two"] and not non_pow2["ok"]


def test_fake_two_host_mesh_marks_top_bit_dcn():
    """Host-contiguous 2-host mesh: only the top device bit is DCN."""
    rep = placement.placement_report(FakeMesh([0, 0, 0, 0, 1, 1, 1, 1]),
                                     n=10)
    links = [b["link"] for b in rep["device_bits"]]
    assert links == ["ICI", "ICI", "DCN"]
    assert rep["n_processes"] == 2
    assert rep["invariants"]["ok"]


def test_cli_placement_subcommand():
    script = (
        "import sys, os; sys.path.insert(0, %r);"
        "os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8';"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from quantum_simulations_tpu.__main__ import main;"
        "sys.exit(main(['placement','--devices','8','--qubits','6']))"
        % str(REPO))
    res = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    rep = json.loads(res.stdout)
    assert rep["invariants"]["ok"] and rep["sharded_array_check"]["ok"]
