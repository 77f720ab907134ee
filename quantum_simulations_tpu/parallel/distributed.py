"""Multi-host (DCN) scaffolding: process init + pod-scale meshes.

The single-host tier shards the statevector over the local chips'
ICI; a v5p-16 (or larger pod slice) spans multiple *hosts*, whose
chips are reached through ``jax.distributed`` — every process runs
the same program, sees the global device list, and XLA routes
collectives over ICI within a host and DCN across hosts.

This is the TPU-native replacement for the reference's MPI tier
(``v3_hisvsim_spark/hisvsim_repo/svsim-mpi.hpp:12-198``: rank setup,
communicator split, pairwise exchange) and its Spark cluster runner
(``wenbo_engine/runner/spark_runner.py:67-136``): instead of explicit
rank bookkeeping, initialization is one call per process and the mesh
abstraction carries the topology.

Device ordering matters: :func:`make_pod_mesh` keeps each host's
devices contiguous on the mesh axis, so the LOW device bits of the
sharded amplitude index change within a host (exchanges ride ICI) and
only the TOP bits cross DCN.  The staging scheduler consumes
:func:`device_bit_costs` to prefer SWAP/reshard plans that keep
traffic off DCN (SURVEY hard-part: mesh-aware transition cost).

Validated without TPU-pod hardware by a REAL two-process cluster:
``tests/test_multiprocess_dcn.py`` rendezvouses two OS processes (4
virtual CPU devices each) through this module, builds the 8-device
pod mesh, and runs cross-process collectives (ppermute, all_to_all,
psum) over Gloo — the same PJRT cross-process path a multi-host pod
takes over DCN.  (Mirrors the reference's local[2] Spark stance,
``wenbo_engine/tests/test_spark_runner_small.py:27-44``, but with
actual process boundaries.)
"""
from __future__ import annotations

import math
import os

import numpy as np

_INITIALIZED = False


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> bool:
    """Initialize the JAX multi-host runtime (idempotent).

    Arguments default from the environment (``QST_COORDINATOR``,
    ``QST_NUM_PROCESSES``, ``QST_PROCESS_ID``); on TPU pods all of
    them may be None and ``jax.distributed.initialize`` autodetects
    the slice topology from the metadata server.  Returns True when a
    multi-process runtime was (or already is) initialized, False when
    running single-process with no coordinator configured.
    """
    global _INITIALIZED
    import jax

    if _INITIALIZED:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "QST_COORDINATOR")
    if num_processes is None and "QST_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["QST_NUM_PROCESSES"])
    if process_id is None and "QST_PROCESS_ID" in os.environ:
        process_id = int(os.environ["QST_PROCESS_ID"])

    # Pod-slice autodetection: only when the metadata names MORE THAN
    # ONE worker host.  (Single-host runtimes — including this image's
    # sitecustomize, which sets TPU_WORKER_HOSTNAMES=localhost — have
    # nothing to rendezvous.)
    autodetect = (
        coordinator_address is None
        and num_processes is None
        and "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
    )
    if coordinator_address is None and not autodetect:
        return False  # single-process run: nothing to initialize

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _INITIALIZED = True
    return True


def is_multihost() -> bool:
    import jax

    return jax.process_count() > 1


def make_pod_mesh(n_devices: int | None = None):
    """1-D amplitude mesh over ALL processes' devices, host-contiguous.

    Must be called after :func:`init_distributed` on every process.
    Devices are ordered (process, local) so device-bit b of the
    sharded index is intra-host for b < log2(devices_per_host):
    low-bit exchanges ride ICI, only top bits cross DCN.
    """
    import jax
    from .mesh import AXIS, Mesh

    devs = sorted(
        jax.devices(), key=lambda d: (d.process_index, d.id))
    if n_devices is None:
        n_devices = 1 << int(math.log2(len(devs)))
    if n_devices & (n_devices - 1):
        raise ValueError(f"n_devices must be a power of two, got {n_devices}")
    if n_devices > len(devs):
        raise ValueError(f"need {n_devices} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n_devices]), (AXIS,))


# Relative per-byte costs of moving a shard across one device-bit
# boundary.  ICI (intra-host ring) vs DCN (data-center network):
# v5p ICI ~ 4x9 100 GB/s links per chip vs ~ 25 GB/s DCN per host —
# order-of-magnitude ratio is what the scheduler needs, not the
# precise figure.
ICI_COST = 1.0
DCN_COST = 20.0


def device_bit_costs(mesh) -> list[float]:
    """Per-device-bit exchange cost (index b = mesh-axis bit b).

    Bit b of the device index flips between devices that are
    2^b apart on the mesh axis; if those two devices live on the same
    process the exchange rides ICI, else DCN.
    """
    devs = list(mesh.devices.reshape(-1))
    d = int(math.log2(len(devs)))
    costs = []
    for b in range(d):
        stride = 1 << b
        cross = any(
            devs[i].process_index != devs[i ^ stride].process_index
            for i in range(len(devs))
        )
        costs.append(DCN_COST if cross else ICI_COST)
    return costs
