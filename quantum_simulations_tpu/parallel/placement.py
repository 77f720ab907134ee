"""Shard-placement reporting and verification.

The TPU-native analogue of the reference's cluster distribution
verifiers (``v2_spark/scripts/verify_distribution.py`` and
``verify_real_distribution.py``, which inspect executor/partition
placement on the docker-compose Spark cluster): given a device mesh —
and optionally an actual sharded statevector — report exactly where
every amplitude range lives (device, process/host, ICI vs DCN reach)
and verify the placement invariants the execution tiers rely on:

* the mesh is a power-of-two 1-D amplitude mesh;
* each host's devices are CONTIGUOUS on the mesh axis (low device bits
  ride ICI, only top bits cross DCN — ``distributed.make_pod_mesh``);
* a sharded array's addressable shards cover exactly the index ranges
  the mesh formula assigns (device s holds [s*2^k, (s+1)*2^k)).

``python -m quantum_simulations_tpu placement`` prints the report.
"""
from __future__ import annotations

import math

import numpy as np

from . import distributed
from .mesh import AXIS, device_bits, shard_width


def placement_report(mesh, n: int | None = None) -> dict:
    """Describe where every shard of an n-qubit state lives.

    Returns a dict with per-device rows (mesh position, device, process,
    amplitude range), a device-bit table (which qubit each mesh bit
    carries and whether flipping it crosses ICI or DCN), and the checked
    placement invariants.
    """
    devs = list(mesh.devices.reshape(-1))
    d = device_bits(mesh)
    k = shard_width(mesh, n) if n is not None else None
    costs = distributed.device_bit_costs(mesh)

    rows = []
    for s, dev in enumerate(devs):
        row = {
            "mesh_pos": s,
            "device": str(dev),
            "process": int(getattr(dev, "process_index", 0)),
        }
        if k is not None:
            row["amp_range"] = [s << k, (s + 1) << k]
        rows.append(row)

    bit_table = []
    for b in range(d):
        bit_table.append({
            "device_bit": b,
            "qubit": (k + b) if k is not None else None,
            "link": "DCN" if costs[b] == distributed.DCN_COST else "ICI",
            "rel_cost": costs[b],
        })

    return {
        "n_devices": len(devs),
        "n_processes": len({r["process"] for r in rows}),
        "n_qubits": n,
        "local_qubits": k,
        "axis": AXIS,
        "devices": rows,
        "device_bits": bit_table,
        "invariants": check_invariants(mesh),
    }


def check_invariants(mesh) -> dict:
    """Placement invariants the sharded tiers assume.

    host_contiguous: every process's devices occupy one contiguous run
    of mesh positions, so the ICI/DCN boundary is a clean bit split
    (the ``make_pod_mesh`` ordering contract).
    """
    devs = list(mesh.devices.reshape(-1))
    size = len(devs)
    pow2 = size & (size - 1) == 0

    first_last: dict[int, list[int]] = {}
    counts: dict[int, int] = {}
    for s, dev in enumerate(devs):
        p = int(getattr(dev, "process_index", 0))
        counts[p] = counts.get(p, 0) + 1
        lo_hi = first_last.setdefault(p, [s, s])
        lo_hi[0] = min(lo_hi[0], s)
        lo_hi[1] = max(lo_hi[1], s)
    host_contig = all(hi - lo + 1 == counts[p]
                      for p, (lo, hi) in first_last.items())
    equal_per_host = len(set(counts.values())) <= 1
    return {
        "power_of_two": pow2,
        "host_contiguous": host_contig,
        "equal_devices_per_host": equal_per_host,
        "ok": pow2 and host_contig and equal_per_host,
    }


def verify_sharded_array(psi, mesh, n: int) -> dict:
    """Check a REAL sharded array against the mesh placement formula.

    For every addressable shard of ``psi``: its device must sit on the
    mesh, and its index slice must be exactly [s*2^k, (s+1)*2^k) for
    that device's mesh position s (fully sharded on the amplitude axis
    — no replication, no uneven splits).  Returns ``{"ok": bool,
    "violations": [...], "addressable": int}``; metadata-only, no
    amplitude fetches.
    """
    devs = list(mesh.devices.reshape(-1))
    pos = {dev: s for s, dev in enumerate(devs)}
    k = shard_width(mesh, n)
    violations = []
    shards = list(psi.addressable_shards)
    for sh in shards:
        s = pos.get(sh.device)
        if s is None:
            violations.append(f"device {sh.device} not on mesh")
            continue
        want = (slice(s << k, (s + 1) << k),)
        got = sh.index
        if got != want:
            violations.append(
                f"device {sh.device} (pos {s}): shard index {got}, "
                f"expected {want}")
        if tuple(sh.data.shape) != (1 << k,):
            violations.append(
                f"device {sh.device}: shard shape {sh.data.shape}, "
                f"expected {(1 << k,)}")
    if psi.shape != (1 << n,):
        violations.append(f"global shape {psi.shape} != {(1 << n,)}")
    return {
        "ok": not violations,
        "addressable": len(shards),
        "violations": violations,
    }


def main(n_devices: int | None = None, n: int | None = None) -> dict:
    """Build the ambient mesh (pod-aware) and print the report."""
    from .mesh import make_mesh, zero_state_sharded

    distributed.init_distributed()
    if distributed.is_multihost():
        mesh = distributed.make_pod_mesh(n_devices)
    else:
        mesh = make_mesh(n_devices)
    if n is None:
        n = device_bits(mesh) + 2
    rep = placement_report(mesh, n)
    psi = zero_state_sharded(mesh, n)
    rep["sharded_array_check"] = verify_sharded_array(psi, mesh, n)
    return rep


if __name__ == "__main__":
    import json
    import sys

    kw = {}
    if len(sys.argv) > 1:
        kw["n_devices"] = int(sys.argv[1])
    if len(sys.argv) > 2:
        kw["n"] = int(sys.argv[2])
    print(json.dumps(main(**kw), indent=1))
